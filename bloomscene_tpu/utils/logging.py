"""Run logging / observability.

The reference logs to a hard-wired wandb session opened at import time
(bloomscene.py:22) — here logging is explicit and local-first: a JSONL
event stream + in-memory history, with an *optional* wandb mirror when the
package is importable and a run is requested. Nothing network-touching by
default (zero-egress safe).
"""
from __future__ import annotations

import json
import os
import time
from typing import Optional


class RunLogger:
    def __init__(self, log_dir: Optional[str] = None,
                 use_wandb: bool = False, project: str = "bloomscene_tpu",
                 config: Optional[dict] = None):
        self.history: list[dict] = []
        self._fh = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._fh = open(os.path.join(log_dir, "events.jsonl"), "a")
        self._wandb = None
        if use_wandb:
            try:
                import wandb
                self._wandb = wandb.init(project=project, config=config)
            except Exception:
                self._wandb = None

    def log(self, record: dict, step: Optional[int] = None):
        rec = dict(record)
        rec.setdefault("_time", time.time())
        if step is not None:
            rec.setdefault("step", step)
        self.history.append(rec)
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()
        if self._wandb is not None:
            self._wandb.log(record, step=step)

    def close(self):
        if self._fh:
            self._fh.close()
        if self._wandb is not None:
            self._wandb.finish()
