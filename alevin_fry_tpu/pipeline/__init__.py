"""Pipeline stages: generate-permit-list, collate, quant, infer, convert, view."""
