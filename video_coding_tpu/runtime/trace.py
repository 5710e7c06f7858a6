"""Tracing and observability.

The reference traces every simulation signal and renders waveforms
(Cyclesim trace_all + Waveform.print, SURVEY.md §5). The TPU analogs here:

- ``pipeline_trace``: run the decode datapath with every intermediate
  stage captured (dequant, row pass, column pass, clipped, recon) — the
  per-stage tensor dump equivalent of signal tracing, used by tests and
  the log CLIs;
- ``profile``: context manager around jax.profiler emitting a TensorBoard
  trace directory (the interactive-waveform analog);
- ``xla_dump``: helper returning XLA_FLAGS for HLO dumps.
"""

from __future__ import annotations

import contextlib
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..model.zigzag import FORWARD
from ..ops import chen_jax
from ..ops.datapath import COEF_MAX, COEF_MIN


@dataclasses.dataclass
class DecodeTrace:
    """Every intermediate tensor of the decode datapath for a batch of
    blocks (the 'waveform' of the block pipeline)."""

    coefs_zigzag: np.ndarray   # (N, 64) input
    dequant_zigzag: np.ndarray
    dequant_natural: np.ndarray
    after_row_pass: np.ndarray  # (N, 8, 8)
    after_col_pass: np.ndarray
    clipped: np.ndarray
    recon: np.ndarray          # (N, 8, 8) final pixels


def pipeline_trace(coefs: np.ndarray, quant: np.ndarray) -> DecodeTrace:
    """Stage-by-stage decode datapath (bit-exact with ops.datapath)."""
    coefs = np.asarray(coefs, dtype=np.int32)
    quant = np.asarray(quant, dtype=np.int32)
    deq_zz = np.clip(coefs.astype(np.int64) * quant, COEF_MIN, COEF_MAX)
    nat = deq_zz[:, np.asarray(FORWARD)]
    tile = jnp.asarray(np.transpose(
        nat.reshape(-1, 8, 8), (1, 2, 0)).astype(np.int32))
    rows = chen_jax._idct_pass_rows(tile)
    cols = chen_jax._idct_pass_cols(rows)
    rows_np = np.transpose(np.asarray(rows), (2, 0, 1))
    cols_np = np.transpose(np.asarray(cols), (2, 0, 1))
    clipped = np.clip(cols_np, -128, 127)
    return DecodeTrace(
        coefs_zigzag=coefs,
        dequant_zigzag=deq_zz.astype(np.int32),
        dequant_natural=nat.reshape(-1, 8, 8).astype(np.int32),
        after_row_pass=rows_np,
        after_col_pass=cols_np,
        clipped=clipped,
        recon=(clipped + 128).astype(np.int32),
    )


@contextlib.contextmanager
def profile(log_dir: str):
    """Capture a device profile (TensorBoard trace) around a region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def xla_dump_flags(dump_dir: str) -> str:
    """XLA_FLAGS value that dumps HLO before/after optimization."""
    return f"--xla_dump_to={dump_dir} --xla_dump_hlo_as_text"
