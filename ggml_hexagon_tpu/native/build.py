"""python -m ggml_hexagon_tpu.native.build — compile the native library."""
from . import build

if __name__ == "__main__":
    print(build(force=True))
