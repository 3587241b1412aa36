"""Native C++ .ards reader: parity with the Python mmap reader."""
import numpy as np
import pytest

from audiossl_tpu.datasets import PackedAudioDataset, write_synthetic_pack
from audiossl_tpu.datasets.native import NativeBatchLoader, NativeReader, get_lib

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="g++ unavailable")


@pytest.fixture(scope="module")
def pack(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pack"))
    write_synthetic_pack(path, "train", 12, min_s=0.3, max_s=0.8,
                         num_labels=4, seed=7)
    return path


def test_native_matches_python_reader(pack):
    ds = PackedAudioDataset(pack, "train")
    nr = NativeReader(ds.reader.path)
    assert len(nr) == len(ds.reader)
    pad = 16000
    idx = np.arange(len(nr))
    wav, valid = nr.read_batch(idx, pad, n_threads=4)
    for i in idx:
        ref, _, _ = ds.reader.read(int(i))
        n = min(len(ref), pad)
        assert valid[i] == n
        np.testing.assert_allclose(wav[i, :n], ref[:n], atol=1e-7)
        assert np.all(wav[i, n:] == 0)
        assert nr.num_samples(int(i)) == len(ref)


def test_native_batch_loader(pack):
    ds = PackedAudioDataset(pack, "train", subset=8)
    loader = NativeBatchLoader(ds, batch_size=4, pad_samples=8000,
                               seed=1)
    batches = list(loader)
    assert len(batches) == 2  # epoch length == subset (lmdb.py:33-38)
    b = batches[0]
    assert b["wav"].shape == (4, 8000)
    assert b["wav"].dtype == np.float32
    assert (b["valid"] > 0).all()


def test_native_rejects_bad_index(pack):
    ds = PackedAudioDataset(pack, "train")
    nr = NativeReader(ds.reader.path)
    with pytest.raises(IOError):
        nr.read_batch(np.array([len(nr) + 5]), 100)


def test_native_loader_prefetch_and_early_exit(tmp_path):
    """Prefetching yields the same batches as the synchronous path and
    breaking out of iteration mid-epoch does not wedge the producer."""
    pytest.importorskip("numpy")
    from audiossl_tpu.datasets import write_synthetic_pack
    from audiossl_tpu.datasets.native import NativeBatchLoader, get_lib
    from audiossl_tpu.datasets.packed import PackedAudioDataset

    if get_lib() is None:
        pytest.skip("no g++")
    data = str(tmp_path / "pack")
    write_synthetic_pack(data, "train", 12, min_s=0.2, max_s=0.4,
                         num_labels=3, seed=0)
    ds = PackedAudioDataset(data, "train")
    mk = lambda pf: NativeBatchLoader(ds, batch_size=3,  # noqa: E731
                                      pad_samples=8000, shuffle=True,
                                      seed=1, prefetch=pf)
    got = [(b["wav"].sum(), tuple(b["valid"])) for b in mk(2)]
    want = [(b["wav"].sum(), tuple(b["valid"])) for b in mk(1)]
    assert got == want and len(got) == 4
    # early exit mid-epoch: no deadlock, next epoch still works
    loader = mk(2)
    for k, _ in enumerate(loader):
        if k == 1:
            break
    assert len(list(loader)) == 4


def test_int16_emit_bitwise_matches_float(tmp_path):
    """wav_dtype=int16 batches, dequantized on device with
    transforms.augment.wav_to_f32, must equal the float32 path
    BITWISE for int16-stored packs (both divide the same int16 sample
    by 32768)."""
    import jax.numpy as jnp
    import numpy as np

    from audiossl_tpu.datasets import write_synthetic_pack
    from audiossl_tpu.datasets.packed import PackedAudioDataset
    from audiossl_tpu.datasets.pipeline import BatchLoader
    from audiossl_tpu.transforms.augment import wav_to_f32

    data = str(tmp_path / "pack")
    write_synthetic_pack(data, "train", 8, min_s=0.2, max_s=0.4,
                         kind="tones", seed=0)
    ds = PackedAudioDataset(data, "train")
    assert ds.reader.all_int16()
    mk = lambda dt: BatchLoader(  # noqa: E731
        ds, 4, pad_samples=8000, shuffle=True, seed=1,
        include_labels=False, wav_dtype=dt)
    for bi, bf in zip(mk(np.int16), mk(np.float32)):
        assert bi["wav"].dtype == np.int16
        deq = np.asarray(wav_to_f32(jnp.asarray(bi["wav"])))
        np.testing.assert_array_equal(deq, bf["wav"])
        np.testing.assert_array_equal(bi["valid"], bf["valid"])


def test_native_int16_emit_matches_python(tmp_path):
    """The C++ int16 batch path equals the python loader's int16
    batches (and the f32 path after dequant)."""
    import numpy as np

    from audiossl_tpu.datasets import write_synthetic_pack
    from audiossl_tpu.datasets.native import NativeBatchLoader, get_lib
    from audiossl_tpu.datasets.packed import PackedAudioDataset
    from audiossl_tpu.datasets.pipeline import BatchLoader

    if get_lib() is None:
        pytest.skip("no g++")
    data = str(tmp_path / "pack")
    write_synthetic_pack(data, "train", 10, min_s=0.2, max_s=0.4,
                         kind="tones", seed=2)
    ds = PackedAudioDataset(data, "train")
    nb = list(NativeBatchLoader(ds, 5, pad_samples=8000, shuffle=True,
                                seed=3, wav_dtype=np.int16))
    pb = list(BatchLoader(ds, 5, pad_samples=8000, shuffle=True, seed=3,
                          include_labels=False, wav_dtype=np.int16))
    # same seed => same order for the native loader's permutation? the
    # two loaders shuffle differently; compare as multisets of rows
    def rows(batches):
        out = []
        for b in batches:
            assert b["wav"].dtype == np.int16
            for i in range(b["wav"].shape[0]):
                out.append((b["wav"][i].tobytes(), int(b["valid"][i])))
        return sorted(out)

    assert rows(nb) == rows(pb)
