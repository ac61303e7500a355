"""Multi-host input pipeline helpers.

The reference trains multi-GPU with Accelerate/DDP, where each rank's
DataLoader serves rank-local batches (reference: src/f5_tts/model/trainer.py
via accelerate's dataloader sharding). The TPU-pod equivalent: every process
iterates the SAME deterministic DynamicBatchSampler sequence (same frame
lengths + seed), loads audio only for the global-batch rows its addressable
devices own, and assembles the global device array with
`jax.make_array_from_process_local_data`.

Width agreement: processes never see each other's mel tensors, so the pad
width is derived from the sampler's duration-based frame estimates (identical
on every process) rounded up to the compile bucket; `collate(pad_to=...)`
then pads/truncates the local shard to exactly that width. Text is cheap
(strings), so every process tokenizes the full global batch and slices its
rows — that also fixes the token pad width globally.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import numpy as np

from f5tts_tpu.utils import round_up


def process_local_rows(sharding, n_rows: int) -> slice:
    """Contiguous range of global batch rows owned by this process under a
    batch-axis sharding. Single-process: the full range."""
    if jax.process_count() == 1:
        return slice(0, n_rows)
    idx_map = sharding.devices_indices_map((n_rows,))
    starts, stops = [], []
    for dev, idx in idx_map.items():
        if dev.process_index != jax.process_index():
            continue
        s = idx[0]
        starts.append(0 if s.start is None else s.start)
        stops.append(n_rows if s.stop is None else s.stop)
    return slice(min(starts), max(stops))


def assemble_global(sharding, local_np: np.ndarray, global_rows: int):
    """Local [rows_local, ...] host array -> global jax.Array [global_rows, ...]."""
    global_shape = (global_rows, *local_np.shape[1:])
    if jax.process_count() == 1:
        return jax.device_put(local_np, sharding)
    return jax.make_array_from_process_local_data(sharding, local_np, global_shape)


def global_pad_width(frame_len_estimates: Sequence[float], bucket_frames: int = 64,
                     max_frames: int | None = None) -> int:
    """Pad width every process agrees on, from the sampler's shared duration
    estimates (NOT local mel shapes, which other processes can't see)."""
    width = round_up(int(math.ceil(max(frame_len_estimates))), bucket_frames)
    if max_frames is not None:
        width = min(width, max_frames)
    return width
