"""Dataset archive extraction.

Reference: utils/unzip_dataset.py:22-113 — system ``unzip`` subprocess with
progress, Python ``zipfile`` fallback, result validation.  Host-side tooling;
kept minimal and dependency-free.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import zipfile
from typing import Optional


def unzip_dataset(
    zip_path: str = "data/images.zip",
    out_dir: Optional[str] = None,
    expect_min_files: int = 1,
) -> int:
    """Extract ``zip_path`` next to itself (or into ``out_dir``). Returns the
    number of extracted files. Prefers the system ``unzip`` binary (faster,
    streams), falls back to ``zipfile``."""
    if not os.path.exists(zip_path):
        raise FileNotFoundError(zip_path)
    out_dir = out_dir or os.path.dirname(os.path.abspath(zip_path))
    os.makedirs(out_dir, exist_ok=True)

    if shutil.which("unzip"):
        try:
            subprocess.run(
                ["unzip", "-o", "-q", zip_path, "-d", out_dir],
                check=True,
                capture_output=True,
            )
        except subprocess.CalledProcessError as e:
            print(f"system unzip failed ({e}); falling back to zipfile")
            _py_unzip(zip_path, out_dir)
    else:
        _py_unzip(zip_path, out_dir)

    with zipfile.ZipFile(zip_path) as zf:
        names = [n for n in zf.namelist() if not n.endswith("/")]
    missing = [n for n in names[:100] if not os.path.exists(os.path.join(out_dir, n))]
    if missing or len(names) < expect_min_files:
        raise RuntimeError(f"extraction incomplete: {len(missing)} sampled files missing")
    print(f"extracted {len(names)} files to {out_dir}")
    return len(names)


def _py_unzip(zip_path: str, out_dir: str) -> None:
    with zipfile.ZipFile(zip_path) as zf:
        zf.extractall(out_dir)
