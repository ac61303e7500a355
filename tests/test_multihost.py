"""Multi-host input pipeline helpers (single-process semantics + invariants)."""

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from f5tts_tpu.config import MelConfig
from f5tts_tpu.parallel.mesh import make_mesh
from f5tts_tpu.train import multihost as mh
from f5tts_tpu.train.dataset import CustomDataset, Sample, collate


def test_process_local_rows_single_process_full_range():
    mesh = make_mesh(data=4, model=2)
    dsh = NamedSharding(mesh, P("data"))
    rows = mh.process_local_rows(dsh, 8)
    assert (rows.start, rows.stop) == (0, 8)


def test_assemble_global_single_process_matches_device_put():
    mesh = make_mesh(data=4, model=2)
    dsh = NamedSharding(mesh, P("data"))
    local = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    arr = mh.assemble_global(dsh, local, 8)
    np.testing.assert_array_equal(np.asarray(arr), local)
    assert arr.sharding.spec == P("data")


def test_global_pad_width_buckets_estimates():
    assert mh.global_pad_width([100.2, 317.9]) == 320
    assert mh.global_pad_width([64.0]) == 64
    assert mh.global_pad_width([1000.0], max_frames=512) == 512


def test_collate_pad_to_exact_width():
    samples = [Sample(mel=np.ones((50, 4), np.float32), text="a"),
               Sample(mel=np.ones((70, 4), np.float32), text="b")]
    out = collate(samples, pad_to=128)
    assert out["mel"].shape == (2, 128, 4)
    assert list(out["mel_lengths"]) == [50, 70]
    # pad_to below a sample length truncates consistently
    out2 = collate(samples, pad_to=64)
    assert out2["mel"].shape == (2, 64, 4)
    assert list(out2["mel_lengths"]) == [50, 64]


def test_get_text_mirrors_bad_row_skipping():
    rows = [
        {"text": "good0", "duration": 1.0, "audio_path": "x.wav"},
        {"text": "bad", "duration": 0.1, "audio_path": "x.wav"},   # skipped
        {"text": "good2", "duration": 2.0, "audio_path": "x.wav"},
    ]
    ds = CustomDataset(rows, mel_cfg=MelConfig())
    # index 1 resolves forward to index 2 for BOTH accessors
    assert ds._resolve_index(1) == 2
    assert ds.get_text(1) == "good2"
    assert ds.get_text(0) == "good0"
