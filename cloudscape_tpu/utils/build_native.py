"""Build the native asset pipeline: `python -m cloudscape_tpu.utils.build_native`."""

from __future__ import annotations

import os
import subprocess
import sys


def build(verbose: bool = True) -> bool:
    native_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "native",
    )
    src = os.path.join(native_dir, "assetio.cpp")
    out = os.path.join(native_dir, "libassetio.so")
    if not os.path.exists(src):
        if verbose:
            print(f"source not found: {src}", file=sys.stderr)
        return False
    cmd = ["g++", "-O3", "-march=native", "-fPIC", "-shared", "-Wall",
           "-o", out, src]
    try:
        subprocess.run(cmd, check=True, capture_output=not verbose)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        if verbose:
            print(f"native build failed: {e}", file=sys.stderr)
        return False
    if verbose:
        print(f"built {out}")
    return True


if __name__ == "__main__":
    sys.exit(0 if build() else 1)
