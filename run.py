#!/usr/bin/env python3
"""Drop-in entry point matching the reference's `python run.py ...` usage.

Thin shim over mica_tpu.cli.run (same flags as the reference run.py:46-116).
"""

from mica_tpu.cli.run import main

if __name__ == "__main__":
    raise SystemExit(main())
