#!/bin/sh
# Build the sphere-splat rasterizer as a ctypes-loadable shared library.
cd "$(dirname "$0")" && g++ -std=c++17 -shared -fPIC -O3 -o render_balls.so render_balls.cpp
