"""Build the native host-side library (cc -> libadanerf_native.so).

Run: python -m adanerf_tpu.native.build
Falls back silently: all callers have numpy implementations.
"""

import os
import subprocess
import sys


def build():
    here = os.path.dirname(os.path.abspath(__file__))
    src_c = os.path.join(here, "disc_depth.c")
    src_cpp = os.path.join(here, "dataloader.cpp")
    out = os.path.join(here, "libadanerf_native.so")
    obj_c = os.path.join(here, "disc_depth.o")
    obj_cpp = os.path.join(here, "dataloader.o")
    attempts = (["-O3", "-march=native", "-fopenmp"], ["-O3"])
    for flags in attempts:
        try:
            subprocess.run(["cc"] + flags + ["-fPIC", "-c", src_c, "-o", obj_c],
                           check=True, capture_output=True)
            subprocess.run(["g++", "-std=c++17"] + flags[:2]
                           + ["-fPIC", "-c", src_cpp, "-o", obj_cpp],
                           check=True, capture_output=True)
            link = ["g++", "-shared", obj_c, obj_cpp, "-o", out,
                    "-lm", "-lpng", "-lz", "-lpthread"]
            if "-fopenmp" in flags:
                link.append("-fopenmp")
            subprocess.run(link, check=True, capture_output=True)
            print(f"built {out}")
            return True
        except (subprocess.CalledProcessError, FileNotFoundError):
            continue
    print("native build failed; numpy fallbacks will be used", file=sys.stderr)
    return False


if __name__ == "__main__":
    sys.exit(0 if build() else 1)
