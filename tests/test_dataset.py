"""Differential tests: data layer vs reference commu/model/dataset.py.

Builds a tiny synthetic corpus in the reference's object-array npy format and
drives both iterator implementations over it, comparing every yielded batch
bit-for-bit (ours is batch-major [B, T]; the reference is time-major [T, B]).
"""
import numpy as np
import pytest

from conftest import add_reference_to_path, reference_available

from commu_tpu.data.dataset import ComMUDataset, save_corpus
from commu_tpu.vocab.event_tokens import PAD_ID


def _make_corpus(tmp_path, n_train=13, n_val=7, seed=0):
    rng = np.random.RandomState(seed)
    def seqs(n):
        metas, events = [], []
        for _ in range(n):
            metas.append(rng.randint(560, 729, size=11).astype(np.int64))
            events.append(rng.randint(2, 560, size=rng.randint(5, 90)).astype(np.int64))
        return metas, events
    tm, te = seqs(n_train)
    vm, ve = seqs(n_val)
    save_corpus(tmp_path, "train", tm, te)
    save_corpus(tmp_path, "val", vm, ve)
    return tmp_path


@pytest.fixture()
def corpus(tmp_path):
    return _make_corpus(tmp_path)


def _reference_dataset(corpus):
    add_reference_to_path()
    from commu.model.dataset import ComMUDataset as RefDataset

    class _Cfg:  # the reference's ctor stores cfg but the iterators ignore it
        pass

    return RefDataset(str(corpus), _Cfg())


def test_split_loading_matches_reference(corpus):
    if not reference_available():
        pytest.skip("reference unavailable")
    ours = ComMUDataset(corpus)
    ref = _reference_dataset(corpus)
    for split, ref_data in (("train", ref.train_data), ("valid", ref.valid_data),
                            ("test", ref.test_data)):
        assert len(ours.split_data(split)) == len(ref_data)
        for a, b in zip(ours.split_data(split), ref_data):
            np.testing.assert_array_equal(a, b.numpy())
        np.testing.assert_array_equal(
            ours.split_lengths(split),
            np.array([len(s) for s in ref_data], dtype=np.int32))


@pytest.mark.parametrize("shuffle,seed", [(True, 3), (False, None)])
def test_train_iterator_matches_reference(corpus, shuffle, seed):
    if not reference_available():
        pytest.skip("reference unavailable")
    batch, bptt, steps = 4, 16, 60
    ours = ComMUDataset(corpus)
    ref = _reference_dataset(corpus)

    ref_iter = ref.get_iterator(batch, bptt, "cpu", split="train",
                                do_shuffle=shuffle, seed=seed)()
    our_iter = ours.train_iterator(batch, bptt, shuffle=shuffle, seed=seed)

    for _ in range(steps):
        try:
            rd, rt, rr, rtok = next(ref_iter)
        except StopIteration:
            with pytest.raises(StopIteration):
                next(our_iter)
            return
        b = next(our_iter)
        np.testing.assert_array_equal(b.inputs, rd.numpy().T)
        np.testing.assert_array_equal(b.targets, rt.numpy().T)
        np.testing.assert_array_equal(b.reset, rr.numpy())
        assert b.token_count == rtok


@pytest.mark.parametrize("num_shards,shard", [(0, 0), (3, 0), (3, 1), (3, 2)])
def test_eval_iterator_matches_reference(corpus, num_shards, shard):
    if not reference_available():
        pytest.skip("reference unavailable")
    batch, bptt = 3, 16
    ours = ComMUDataset(corpus)
    ref = _reference_dataset(corpus)

    ref_iter = ref.eval_iterator(batch, bptt, "cpu", split="valid",
                                 local_rank=shard, world_size=num_shards)()
    our_iter = ours.eval_iterator(batch, bptt, split="valid",
                                  shard_index=shard, num_shards=num_shards)

    # NOTE: the reference yields the *same* tensor objects every window
    # (allocated once, dataset.py:209-210), so compare incrementally.
    n_ref = 0
    for (rd, rt, rreset, rtok), b in zip(ref_iter, our_iter):
        np.testing.assert_array_equal(b.inputs, rd.numpy().T)
        np.testing.assert_array_equal(b.targets, rt.numpy().T)
        assert bool(b.reset[0]) == bool(rreset)
        assert b.token_count == rtok
        n_ref += 1
    # both exhausted together
    assert next(iter(our_iter), None) is None
    assert n_ref > 0


def test_eval_shards_cover_all_sequences(corpus):
    """Every sequence's tokens are evaluated exactly once across shards
    (mirrors dataset.py:196-205 coverage)."""
    ours = ComMUDataset(corpus)
    total = ours.num_tokens("valid")
    covered = 0
    for shard in range(3):
        for b in ours.eval_iterator(3, 16, split="valid", shard_index=shard,
                                    num_shards=3):
            covered += b.token_count
    assert covered == total


def test_pad_is_bos(corpus):
    ours = ComMUDataset(corpus)
    for seq in ours.split_data("train"):
        assert seq[0] == PAD_ID
