"""scATAC-seq pipeline: generate-permit-list, collate, sort, deduplicate."""
