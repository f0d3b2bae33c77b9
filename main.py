#!/usr/bin/env python
"""Entry point — mirrors the reference CLI (reference: main.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from focused_attention_vit_tpu.cli import main

if __name__ == "__main__":
    main()
