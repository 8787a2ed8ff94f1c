#!/usr/bin/env python3
"""Drop-in entry point matching the reference's `python train.py ...` usage."""

from mica_tpu.cli.train import main

if __name__ == "__main__":
    raise SystemExit(main())
