"""`python -m tpu_ecm` == the avx-ecm-compatible CLI (io/cli.py)."""

from .io.cli import main

raise SystemExit(main())
