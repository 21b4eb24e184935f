"""Build the native siftio extension in-place.

Usage: python native/build.py
Produces cudasift_tpu/_siftio<ext>.so; the Python loader in
cudasift_tpu.utils.native falls back to pure-Python codecs when absent.
"""

import pathlib
import subprocess
import sys
import sysconfig


def main() -> int:
    root = pathlib.Path(__file__).resolve().parent
    out_dir = root.parent / "cudasift_tpu"
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = out_dir / f"_siftio{suffix}"
    include = sysconfig.get_paths()["include"]
    cmd = [
        "g++",
        "-O2",
        "-shared",
        "-fPIC",
        "-std=c++17",
        f"-I{include}",
        str(root / "siftio.cpp"),
        "-o",
        str(out),
    ]
    print(" ".join(cmd))
    subprocess.check_call(cmd)
    print(f"built {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
