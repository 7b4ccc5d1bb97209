"""Run-directory layout + logging (reference `utils.py:94-108,326-349` and
the wandb channel, made optional since no tracking server is assumed).

Layout: <run_dir>/<proj>/<exp>/{models,files,metrics.jsonl,<ts>.log}.
Metrics additionally stream to a JSONL file so anything (notebooks, the
bench harness) can consume them without a wandb server.
"""

from __future__ import annotations

import datetime
import json
import logging as pylogging
import os
import sys

import jax


def is_chief() -> bool:
    return jax.process_index() == 0


class RunDir:
    def __init__(self, run_dir: str, proj: str, exp: str):
        self.root = os.path.join(run_dir, proj, exp)
        for sub in ("models", "files"):
            os.makedirs(os.path.join(self.root, sub), exist_ok=True)

    def model_path(self, name: str) -> str:
        return os.path.join(self.root, "models", name + ".ckpt")

    def file(self, name: str) -> str:
        return os.path.join(self.root, name)


class Logger:
    def __init__(self, run: RunDir | None = None, name: str = "vipformer",
                 to_file: bool = True):
        self._logger = pylogging.getLogger(name + str(id(self)))
        self._logger.setLevel(pylogging.INFO)
        self._logger.propagate = False
        fmt = pylogging.Formatter(
            "%(asctime)s [%(levelname)s] [%(name)s] %(message)s"
        )
        sh = pylogging.StreamHandler(sys.stdout)
        sh.setFormatter(fmt)
        self._logger.addHandler(sh)
        self._metrics_path = None
        if run is not None and to_file and is_chief():
            ts = datetime.datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
            fh = pylogging.FileHandler(run.file(f"{ts}.log"))
            fh.setFormatter(fmt)
            self._logger.addHandler(fh)
            self._metrics_path = run.file("metrics.jsonl")

    def write(self, msg: str) -> None:
        if is_chief():
            self._logger.info(msg)

    def metrics(self, step: int, **kv) -> None:
        if self._metrics_path and is_chief():
            with open(self._metrics_path, "a") as f:
                f.write(json.dumps({"step": step, **kv}, default=float) + "\n")


def maybe_wandb(cfg):
    """Optional wandb hookup (the package is not baked into this image)."""
    try:
        import wandb  # noqa

        wandb.init(project=cfg.proj_name, name=cfg.exp_name)
        return wandb
    except Exception:
        return None
