"""Run metrics logging: local JSONL with an optional wandb passthrough.

The reference logs training scalars/tables to wandb (reference
train.py:1366-1386 and utils_config.py:10-19). wandb isn't a hard dependency
here: MetricsLogger always writes JSONL locally (one {"_step", ...} object
per line) and forwards to wandb when the package is importable and enabled —
the same call surface (log(dict), log_table) either way.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Optional

from novic_tpu.utils.logger import log as _console


class MetricsLogger:

    def __init__(self, run_dir: Optional[str] = None, use_wandb: bool = False,
                 project: str = "novic_tpu", config: Optional[dict] = None,
                 name: Optional[str] = None,
                 wandb_kwargs: Optional[dict] = None):
        self.run_dir = run_dir
        self._file = None
        self._step = 0
        if run_dir:
            os.makedirs(run_dir, exist_ok=True)
            self._file = open(os.path.join(run_dir, "metrics.jsonl"), "a")
            if config:
                with open(os.path.join(run_dir, "config.json"), "w") as f:
                    json.dump(config, f, indent=2, default=str)
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb
                # entity/group/name/tags/job_type passthrough (ref wandb_* keys,
                # ref config/train.yaml:24-33); falsy values are dropped so
                # empty-string config defaults don't override wandb's own.
                # The explicit name= param wins over wandb_kwargs['name'].
                kw = {k: v for k, v in (wandb_kwargs or {}).items() if v}
                if name:
                    kw["name"] = name
                wandb.init(project=project, config=config, **kw)
            except ImportError:
                _console.warning("wandb requested but not installed => local JSONL only")

    def log(self, metrics: dict[str, Any]):
        self._step += 1
        if self._file:
            record = {"_step": self._step, "_time": time.time()}
            record.update({k: v for k, v in metrics.items() if _jsonable(v)})
            self._file.write(json.dumps(record) + "\n")
            self._file.flush()
        if self._wandb:
            self._wandb.log(metrics)

    def log_table(self, key: str, columns: list[str], rows: list[list]):
        if self._file:
            self._file.write(json.dumps({"_step": self._step, "_table": key,
                                         "columns": columns, "rows": rows},
                                        default=str) + "\n")
            self._file.flush()
        if self._wandb:
            self._wandb.log({key: self._wandb.Table(columns=columns, data=rows)})

    def finish(self):
        if self._file:
            self._file.close()
            self._file = None
        if self._wandb:
            self._wandb.finish()


def _jsonable(v) -> bool:
    return isinstance(v, (int, float, str, bool, type(None)))
