#!/usr/bin/env python3
"""Compile the reference C++ renderer and stage its run directory.

The reference ships only sources (reference Code/CMakeLists.txt builds a
single `Raytracer` executable from six .cpp files, C++17, no external deps
beyond the vendored json.hpp).  This script reproduces that build with g++
directly — no CMake needed — and lays out the directory structure the binary
expects at runtime:

    golden/build/run/Raytracer      the executable (cwd for all runs)
    golden/ASCII/<scene>.json       scene inputs  (../../ASCII/ from run/)
    golden/Output/<name>.ppm        renders       (../../Output/ from run/)
    golden/Textures/<name>.ppm      textures      (../../Textures/ from run/)

(The binary hardcodes those relative paths: reference Code/raytracer.cpp:358,
397-398 and Code/json_loader.cpp:78-86.)

Usage:
    python tools/build_reference.py            # build (no-op if up to date)
    python tools/build_reference.py --force    # always rebuild

Then regenerate goldens with tools/make_test_scenes.py.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_CODE = "/root/reference/Code"
RUN_DIR = os.path.join(REPO, "golden", "build", "run")
BINARY = os.path.join(RUN_DIR, "Raytracer")

SOURCES = [
    "raytracer.cpp",
    "camera.cpp",
    "shapes.cpp",
    "acceleration.cpp",
    "image.cpp",
    "json_loader.cpp",
]


def build(force=False):
    srcs = [os.path.join(REF_CODE, s) for s in SOURCES]
    for s in srcs:
        if not os.path.exists(s):
            sys.exit(f"reference source missing: {s}")
    if os.path.exists(BINARY) and not force:
        newest_src = max(os.path.getmtime(s) for s in srcs)
        if os.path.getmtime(BINARY) >= newest_src:
            print(f"up to date: {BINARY}")
            return BINARY
    os.makedirs(RUN_DIR, exist_ok=True)
    cmd = ["g++", "-std=c++17", "-O2", "-o", BINARY] + srcs
    print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    # The binary reads scenes from ../../ASCII and writes ../../Output
    # relative to its cwd (run/): golden/build/run -> golden/ASCII etc.
    for d in ("ASCII", "Output", "Textures"):
        os.makedirs(os.path.join(REPO, "golden", d), exist_ok=True)
    print(f"built {BINARY}")
    return BINARY


if __name__ == "__main__":
    build(force="--force" in sys.argv)
