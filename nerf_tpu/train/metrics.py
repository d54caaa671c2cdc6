"""Metrics: PSNR (reference formula) and structured run logging.

The reference's only metric is PSNR computed inline
(``train_conditional_nerf.py:152-153``: ``-10 * ln(mse) / 2.30258509299``)
with results appended to Python lists and dumped as ``.npy`` files
(``:163-174``).  This module keeps that exact formula (parity), adds the
north-star throughput metrics (rays/s/chip, step time), and writes both a
structured JSONL stream and the reference-compatible ``.npy`` dumps.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

LN10 = 2.30258509299  # the reference's hardcoded ln(10)


def mse_to_psnr(mse) -> jnp.ndarray:
    """Reference formula at train_conditional_nerf.py:152-153."""
    return -10.0 * jnp.log(mse) / LN10


def psnr(pred, target) -> jnp.ndarray:
    return mse_to_psnr(jnp.mean((pred - target) ** 2))


class MetricsLogger:
    """Host-side scalar logger: JSONL stream + reference-style .npy dumps."""

    def __init__(self, logging_dir: Optional[str] = None):
        self.logging_dir = logging_dir
        self.history: List[Dict] = []
        self._t0 = time.time()
        if logging_dir:
            os.makedirs(logging_dir, exist_ok=True)
            self._jsonl = open(
                os.path.join(logging_dir, "metrics.jsonl"), "a"
            )
        else:
            self._jsonl = None

    def log(self, step: int, **scalars) -> Dict:
        record = {"step": int(step), "wall_s": time.time() - self._t0}
        for k, v in scalars.items():
            record[k] = float(v) if np.ndim(v) == 0 else np.asarray(v).tolist()
        self.history.append(record)
        if self._jsonl:
            self._jsonl.write(json.dumps(record) + "\n")
            self._jsonl.flush()
        return record

    def series(self, name: str) -> List:
        return [r[name] for r in self.history if name in r]

    def save_npy_dumps(self) -> None:
        """Reference-compatible dumps (train_conditional_nerf.py:163-174)."""
        if not self.logging_dir:
            return
        psnrs = [r["psnr"] for r in self.history if "psnr" in r]
        iters = [r["step"] for r in self.history if "psnr" in r]
        np.save(
            os.path.join(self.logging_dir, "psnrs.npy"), np.asarray(psnrs)
        )
        np.save(
            os.path.join(self.logging_dir, "iternums.npy"), np.asarray(iters)
        )

    def close(self) -> None:
        if self._jsonl:
            self._jsonl.close()
