"""Build the native host-side library (cc -> libadanerf_native.so).

Run: python -m adanerf_tpu.native.build
Falls back silently: all callers have numpy implementations.
"""

import os
import subprocess
import sys


def build():
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "disc_depth.c")
    out = os.path.join(here, "libadanerf_native.so")
    for flags in (["-O3", "-march=native", "-shared", "-fPIC", "-fopenmp"],
                  ["-O3", "-shared", "-fPIC"]):
        cmd = ["cc"] + flags + [src, "-o", out, "-lm"]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
            print(f"built {out}")
            return True
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            continue
    print("native build failed; numpy fallbacks will be used", file=sys.stderr)
    return False


if __name__ == "__main__":
    sys.exit(0 if build() else 1)
