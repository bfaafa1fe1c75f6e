"""Build the native host library (g++ → librba_native.so).

Usage: python -m rba_tpu.native.build
The library is optional: every caller falls back to numpy when it is
missing, so fresh clones work without a toolchain.
"""
from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "metrics.cc")
OUT = os.path.join(HERE, "librba_native.so")


def build(force: bool = False) -> str:
    if not force and os.path.exists(OUT) and os.path.getmtime(OUT) >= os.path.getmtime(SRC):
        return OUT
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", OUT, SRC]
    subprocess.run(cmd, check=True)
    return OUT


if __name__ == "__main__":
    print(build(force="--force" in sys.argv))
