"""Module entry point: ``python -m alevin_fry_tpu <command> ...``."""

import sys

from .cli import main

if __name__ == "__main__":
    sys.exit(main())
