#!/usr/bin/env python
"""Root CLI entry (reference run.py). All subcommands delegate to
facerec_tpu.cli.main — see `python run.py --help`."""

import sys

from facerec_tpu.cli.main import main

if __name__ == "__main__":
    sys.exit(main())
