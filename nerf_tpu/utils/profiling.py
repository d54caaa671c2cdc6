"""Profiling and observability hooks (SURVEY.md §5 tracing row).

The reference has no profiling at all.  Here:

* ``trace(logdir)``       — context manager around ``jax.profiler`` that
  captures a Perfetto/TensorBoard trace of everything inside it.
* ``step_timer``          — lightweight wall-clock timer that forces device
  sync through a value fetch (this environment's relay makes
  ``block_until_ready`` unreliable, so syncing via fetch is load-bearing;
  see bench.py).
* ``flops_per_point``     — analytic matmul-FLOP model of both MLPs, for
  roofline accounting against chip peak.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False) -> Iterator[None]:
    """Capture a profiler trace of the enclosed block into ``logdir``.

    View with TensorBoard's profile plugin or Perfetto.
    """
    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class step_timer:
    """Wall-clock timer that syncs by fetching a scalar from the device."""

    def __init__(self):
        self.start: Optional[float] = None
        self.elapsed: Optional[float] = None

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def sync(self, value) -> float:
        """Fetch ``value`` (forcing completion) and record elapsed time."""
        jax.device_get(value)
        self.elapsed = time.perf_counter() - self.start
        return self.elapsed

    def __exit__(self, *exc):
        if self.elapsed is None:
            self.elapsed = time.perf_counter() - self.start
        return False


def classic_flops_per_point(cfg) -> int:
    """Matmul FLOPs for one point through the classic MLP (fwd only)."""
    h = cfg.hidden_size
    xe, de = cfg.x_encoding_dim, cfg.d_encoding_dim
    n0, n1 = cfg.trunk_blocks
    flops = 2 * xe * h  # L0
    flops += 2 * h * h * (n0 - 1)
    flops += 2 * (h + xe) * h  # skip layer
    flops += 2 * h * h * (n1 - 1)
    flops += 2 * h * 1  # density head
    if cfg.use_viewdirs:
        flops += 2 * (h + de) * h
        flops += 2 * h * h * (cfg.view_branch_depth - 1)
    flops += 2 * h * cfg.color_outputs
    return flops


def mip_flops_per_point(cfg) -> int:
    h = cfg.hidden_size
    flops = 2 * cfg.feature_dim * h
    flops += 2 * h * h * (cfg.num_hidden_layers - 1)
    flops += 2 * h * cfg.num_outputs
    return flops


def train_step_flops(cfg, num_rays: int, num_samples: int, mip: bool = False) -> int:
    """fwd + bwd (~2x fwd) matmul FLOPs for one train step."""
    per_point = (
        mip_flops_per_point(cfg) if mip else classic_flops_per_point(cfg)
    )
    return 3 * per_point * num_rays * num_samples
