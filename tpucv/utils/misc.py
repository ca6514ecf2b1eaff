"""Small utilities — parity with reference ``core/utils/{useful_tools,show,
file_ops,yaml_tools}.py``."""

from __future__ import annotations

import os
import random
import time
import urllib.request
from typing import Any

import numpy as np

import jax


def get_current_format_time() -> str:
    return time.strftime("%Y-%m-%d %H:%M:%S")


def get_format_filename(model_name: str, dataset_name: str,
                        addition: str = "") -> str:
    return f"{model_name}_{dataset_name}{('_' + addition) if addition else ''}"


def get_random_number(a: int = 0, b: int = 100) -> int:
    return random.randint(a, b)


def move_to_device(tree: Any, device=None) -> Any:
    """Recursive host->device transfer (reference useful_tools.py:21); in JAX
    a single device_put over the pytree."""
    if device is None:
        return jax.device_put(tree)
    return jax.device_put(tree, device)


def colorstr(*args) -> str:
    """ANSI colour wrap (reference show.py colorstr)."""
    *prefix, string = args if len(args) > 1 else ("blue", "bold", args[0])
    colors = {
        "black": "\033[30m", "red": "\033[31m", "green": "\033[32m",
        "yellow": "\033[33m", "blue": "\033[34m", "magenta": "\033[35m",
        "cyan": "\033[36m", "white": "\033[37m", "bold": "\033[1m",
        "underline": "\033[4m", "end": "\033[0m",
    }
    return "".join(colors[p] for p in prefix) + str(string) + colors["end"]


def load_yaml(path: str) -> dict:
    import yaml
    with open(path) as f:
        return yaml.safe_load(f)


def download_file(url: str, dst_dir: str = "downloads") -> str:
    """URL download with local cache (reference file_ops.py)."""
    os.makedirs(dst_dir, exist_ok=True)
    dst = os.path.join(dst_dir, os.path.basename(url))
    if not os.path.isfile(dst):
        urllib.request.urlretrieve(url, dst)
    return dst
