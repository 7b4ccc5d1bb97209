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
        self.wandb = None  # set by cli.common.setup via maybe_wandb
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
        if not is_chief():
            return
        if self._metrics_path:
            with open(self._metrics_path, "a") as f:
                f.write(json.dumps({"step": step, **kv}, default=float) + "\n")
        if self.wandb is not None:
            try:
                self.wandb.log(dict(kv), step=step)
            except Exception as e:  # a dead server must not kill training
                self._logger.warning("wandb.log failed: %s", e)
                self.wandb = None


def maybe_wandb(cfg, logger: "Logger | None" = None):
    """Optional wandb channel (reference `pretrain.py:44-47`,
    `parser.py:159-161`): honors the self-hosted server url and login key,
    chief-process only. Returns the wandb module or None; a missing package
    or failed login is logged, never fatal — `metrics.jsonl` is always
    written regardless.
    """
    if not getattr(cfg, "wandb", False) or not is_chief():
        return None
    try:
        import wandb

        if cfg.wb_url:
            os.environ["WANDB_BASE_URL"] = cfg.wb_url
        if cfg.wb_key:
            wandb.login(key=cfg.wb_key)
        wandb.init(project=cfg.proj_name, name=cfg.exp_name)
        return wandb
    except Exception as e:
        if logger is not None:
            logger.write(f"wandb requested but unavailable: {e}")
        return None
