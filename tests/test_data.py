"""Data-layer tests: chunk planning, splicing, dataset semantics."""

import numpy as np
import pytest

from tpu_se.data import (
    PfilePairDataset, plan_chunks, sentence_windows, splice_frames,
)
from tpu_se.data.splice import splice_replicated, window_starts_for_chunk
from tpu_se.data.pipeline import PrefetchIterator, shard_for_host

FIXTURE_LENS = [146, 143, 247, 227, 168, 177, 192, 191, 190, 204]
SENT_ENDS = np.cumsum(FIXTURE_LENS)


def test_plan_single_chunk_fixture():
    plan = plan_chunks(SENT_ENDS, (0, 7), traincache=102400, context=7)
    assert plan.n_chunks == 1
    # Each of the 8 training sentences loses context-1 = 6 frames.
    expected = sum(FIXTURE_LENS[:8]) - 6 * 8
    assert plan.total_samples == expected
    starts = sentence_windows(plan, 0)
    assert len(starts) == expected
    # First window of sentence 1 starts exactly at its first frame.
    assert starts[0] == 0
    assert starts[146 - 6] == 146  # sentence 1 begins at frame 146


def test_plan_multi_chunk_boundaries():
    plan = plan_chunks(SENT_ENDS, (0, 9), traincache=100, context=7)
    assert (plan.n_samples[:-1] == 100).all()
    total = plan.total_samples
    # Straddled sentences lose an extra 6 frames per boundary, so the total
    # is less than the no-chunking sample count.
    no_chunk = sum(FIXTURE_LENS) - 6 * 10
    assert total <= no_chunk
    # Windows never cross sentence boundaries and lie inside their chunk.
    bounds = np.concatenate([[0], SENT_ENDS])
    for ci in range(plan.n_chunks):
        starts = sentence_windows(plan, ci)
        assert len(starts) == plan.n_samples[ci]
        assert (starts >= plan.frame_start[ci]).all()
        assert (starts + 7 <= plan.frame_end[ci]).all()
        sent_of_start = np.searchsorted(SENT_ENDS, starts, side="right")
        sent_of_end = np.searchsorted(SENT_ENDS, starts + 6, side="right")
        np.testing.assert_array_equal(sent_of_start, sent_of_end)


def test_plan_cv_range():
    plan = plan_chunks(SENT_ENDS, (8, 9), traincache=102400, context=7)
    assert plan.total_samples == (190 - 6) + (204 - 6)
    assert plan.frame_start[0] == SENT_ENDS[7]


def test_splice_frames_layout():
    frames = np.arange(20, dtype=np.float32).reshape(10, 2)
    out = splice_frames(frames, np.array([0, 3]), context=3)
    assert out.shape == (2, 6)
    np.testing.assert_array_equal(out[0], [0, 1, 2, 3, 4, 5])
    np.testing.assert_array_equal(out[1], frames[3:6].ravel())


def test_splice_replicated_edges():
    frames = np.arange(8, dtype=np.float32).reshape(4, 2)
    out = splice_replicated(frames, context=7)
    assert out.shape == (4, 14)
    # First frame: left context all replicate frame 0.
    np.testing.assert_array_equal(out[0][:8], np.tile(frames[0], 4))
    # Last frame: right context all replicate frame 3.
    np.testing.assert_array_equal(out[3][6:], np.tile(frames[3], 4))
    # Interior: exact neighbors.
    np.testing.assert_array_equal(out[2][4:6], frames[1])


def test_dataset_fixture(reference_dir):
    ds = PfilePairDataset(
        reference_dir / "tools_pfile/train_noisy.pfile",
        reference_dir / "tools_pfile/train_clean.pfile",
        reference_dir / "tools_pfile/train_noisy.norm",
        sent_range=(0, 7))
    assert ds.n_chunks == 1
    assert ds.total_samples == sum(FIXTURE_LENS[:8]) - 48
    chunk = ds.chunk(0)
    assert chunk.noisy.shape == (sum(FIXTURE_LENS[:8]), 257)
    # Normalized with the global (10-sentence) stats -> mean near 0.
    assert abs(chunk.noisy.mean()) < 0.2
    assert 0.5 < chunk.noisy.std() < 1.5
    # Targets: clean frame at start + 3 (center of the 7-frame window).
    x = chunk.spliced_inputs()
    t = chunk.targets()
    assert x.shape == (ds.total_samples, 1799)
    assert t.shape == (ds.total_samples, 257)
    np.testing.assert_array_equal(t[0], chunk.clean[3])
    # Center frame of the spliced input is the noisy frame at start + 3.
    np.testing.assert_array_equal(x[0][3 * 257:4 * 257], chunk.noisy[3])


def test_dataset_shuffle_is_permutation(reference_dir):
    ds = PfilePairDataset(
        reference_dir / "tools_pfile/train_noisy.pfile",
        reference_dir / "tools_pfile/train_clean.pfile",
        reference_dir / "tools_pfile/train_noisy.norm",
        sent_range=(0, 7))
    sequential = ds.chunk(0).starts
    shuffled = ds.chunk(0, np.random.default_rng(0)).starts
    assert not np.array_equal(sequential, shuffled)
    np.testing.assert_array_equal(np.sort(shuffled), np.sort(sequential))


def test_prefetch_iterator():
    items = list(PrefetchIterator((lambda i=i: i * i for i in range(10))))
    assert items == [i * i for i in range(10)]


def test_prefetch_iterator_propagates_errors():
    def gen():
        yield 1
        raise RuntimeError("boom")
    it = PrefetchIterator(gen())
    assert next(it) == 1
    with pytest.raises(RuntimeError):
        list(it)


def test_shard_for_host():
    slices = [shard_for_host(10, i, 3) for i in range(3)]
    covered = []
    for s in slices:
        covered.extend(range(*s.indices(10)))
    assert covered == list(range(10))
