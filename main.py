#!/usr/bin/env python
"""Drop-in entry point with the reference CLI surface:
  python main.py <video> [--images-dir D] [--output-dir D] [--hide]
Delegates to rtvm_tpu.cli (mosaic subcommand)."""

from rtvm_tpu.cli import main

if __name__ == "__main__":
    main()
