"""Legacy flat-layout entry point (reference root inference_grid_transformer.py)
— delegates to scripts/inference_grid_transformer.py."""

import os
import runpy
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts"))
runpy.run_path(
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts", "inference_grid_transformer.py"),
    run_name="__main__",
)
