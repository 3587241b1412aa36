"""On-device augmentation semantics tests.

Golden checks against the reference behaviors (torch versions of
RandomResizeCrop / Mixup / RandomCrop — reference
audiossl/transforms/{byol_a,common}.py) where exact equality is defined,
and distributional checks where the TPU design is documented as a
semantic equivalent (in-batch mixup, device-side masks).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiossl_tpu.ops.masking import (
    block_token_mask,
    make_token_mask,
    random_token_mask,
    uniform_span_mask,
)
from audiossl_tpu.transforms.augment import (
    freq_mask,
    mixup_log,
    random_crop_wav,
    random_resize_crop,
    sample_crop_lengths,
    time_mask,
)


def test_random_crop_semantics():
    B, L = 4, 1000
    wav = jnp.tile(jnp.arange(L, dtype=jnp.float32)[None], (B, 1))
    valid = jnp.array([1000, 600, 300, 1000], jnp.int32)
    crop_len = jnp.array([500, 500, 500, 1000], jnp.int32)
    crops, out_valid = random_crop_wav(jax.random.PRNGKey(0), wav, valid,
                                       crop_len, 1000)
    assert crops.shape == (B, 1000)
    np.testing.assert_array_equal(np.asarray(out_valid),
                                  [500, 500, 300, 1000])
    # crop content is contiguous from the source
    c0 = np.asarray(crops[0][:500])
    assert np.all(np.diff(c0) == 1)
    # padded region is zero
    assert np.all(np.asarray(crops[2][300:]) == 0)


def test_mixup_log_range_and_identity():
    B, F, T = 8, 16, 32
    spec = jax.random.uniform(jax.random.PRNGKey(1), (B, F, T),
                              minval=-1.0, maxval=1.0)
    out = mixup_log(jax.random.PRNGKey(2), spec, ratio=0.4)
    assert out.shape == spec.shape
    assert bool(jnp.isfinite(out).all())
    # alpha <= 0.4 keeps the mix close to x in exp space
    assert float(jnp.abs(out - spec).max()) < 1.5
    # ratio=0 -> log(exp(x)+eps) ~= x
    out0 = mixup_log(jax.random.PRNGKey(2), spec, ratio=0.0)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(spec),
                               atol=1e-5)


def test_mixup_log_matches_reference_formula():
    """mixed = log((1-a) exp(x) + a exp(z) + eps) for the rolled batch."""
    B, F, T = 4, 8, 10
    key = jax.random.PRNGKey(3)
    spec = jax.random.uniform(key, (B, F, T), minval=-1.0, maxval=1.0)
    out = np.asarray(mixup_log(key, spec, ratio=0.4))
    k1, k2 = jax.random.split(key)
    a = 0.4 * np.asarray(jax.random.uniform(k1, (B, 1, 1)))
    shift = np.asarray(jax.random.randint(k2, (B,), 1, B))
    z = np.asarray(spec)[(np.arange(B) + shift) % B]
    eps = np.finfo(np.float32).eps
    want = np.log((1 - a) * np.exp(np.asarray(spec)) + a * np.exp(z) + eps)
    np.testing.assert_allclose(out, want, atol=1e-5)


def test_rrc_identity_time_mapping():
    """frame-method path (vc=1, time_scale=(1,1)) must keep time exact:
    column j of the output only mixes frequencies of column j."""
    B, F, T = 4, 16, 20
    # delta in time: one hot column
    spec = jnp.zeros((B, F, T)).at[:, :, 7].set(1.0)
    out = random_resize_crop(jax.random.PRNGKey(0), spec,
                             virtual_crop_scale=(1.0, 1.0),
                             freq_scale=(0.6, 1.5), time_scale=(1.0, 1.0),
                             valid_frames=jnp.full((B,), T, jnp.int32))
    o = np.asarray(out)
    # energy stays in column 7 (bicubic ringing can spill tiny amounts)
    others = np.delete(o, 7, axis=2)
    assert np.abs(others).max() < 1e-4
    assert np.abs(o[:, :, 7]).max() > 0.1


def test_rrc_valid_region_zero_padding():
    B, F, T = 4, 16, 40
    spec = jax.random.normal(jax.random.PRNGKey(1), (B, F, T))
    valid = jnp.array([40, 20, 30, 10], jnp.int32)
    pos = jnp.arange(T)[None, None, :]
    spec = jnp.where(pos < valid[:, None, None], spec, 0.0)
    out = random_resize_crop(jax.random.PRNGKey(2), spec,
                             virtual_crop_scale=(1.0, 1.5),
                             valid_frames=valid)
    o = np.asarray(out)
    assert np.isfinite(o).all()
    for b, v in enumerate([40, 20, 30, 10]):
        assert np.all(o[b, :, v:] == 0)


def test_rrc_matches_torch_bicubic_fixed_box():
    """Full-canvas box == plain bicubic resize; compare to torch."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as tF

    B, F, T = 1, 16, 24
    rng = np.random.RandomState(0)
    x = rng.randn(B, F, T).astype(np.float32)
    # force deterministic box: freq_scale=time_scale=(1.5,1.5), vc=(1.5,1.5)
    # then h=w=canvas size and i=j=0 -> crop == whole canvas
    out = random_resize_crop(jax.random.PRNGKey(0), jnp.asarray(x),
                             virtual_crop_scale=(1.5, 1.5),
                             freq_scale=(1.5, 1.5000001),
                             time_scale=(1.5, 1.5000001))
    CH, CW = int(F * 1.5), int(T * 1.5)
    canvas = np.zeros((B, CH, CW), np.float32)
    y0, x0 = (CH - F) // 2, (CW - T) // 2
    canvas[:, y0:y0 + F, x0:x0 + T] = x
    want = tF.interpolate(torch.from_numpy(canvas).unsqueeze(0),
                          size=(F, T), mode="bicubic",
                          align_corners=True).squeeze(0).numpy()
    np.testing.assert_allclose(np.asarray(out), want, atol=2e-4)


def test_freq_time_mask_shapes():
    B, F, T = 4, 16, 32
    spec = jnp.ones((B, F, T))
    fm = freq_mask(jax.random.PRNGKey(0), spec, max_width=6)
    tm = time_mask(jax.random.PRNGKey(1), spec, max_width=10)
    assert fm.shape == spec.shape and tm.shape == spec.shape
    assert float(fm.min()) == 0.0 or float(fm.max()) == 1.0
    # masked values are exactly zero, others untouched
    assert set(np.unique(np.asarray(fm))) <= {0.0, 1.0}


def test_mask_ratios():
    key = jax.random.PRNGKey(0)
    B, N = 64, 100
    m = random_token_mask(key, B, N, 0.65)
    frac = float(m.mean())
    assert abs(frac - 0.65) < 0.01
    mb = block_token_mask(key, B, N, 0.65, span=5)
    # overlapping spans: fraction below nominal but substantial
    assert 0.3 < float(mb.mean()) <= 0.65 + 0.05
    mu = uniform_span_mask(key, B, N, 0.65, span=5)
    assert 0.2 < float(mu.mean()) <= 0.75


def test_random_mask_respects_valid():
    key = jax.random.PRNGKey(0)
    valid = jnp.array([50, 100], jnp.int32)
    m = random_token_mask(key, 2, 100, 0.5, valid=valid)
    # past-valid tokens are masked True (reference pads mask with 1)
    assert bool(m[0, 50:].all())
    k = int(np.ceil(0.5 * 50))
    assert int(m[0, :50].sum()) == k


def test_block_mask_respects_valid():
    """Fairseq applies the padding mask before sampling: spans stay
    inside each sample's valid region and their count scales with the
    valid length (reference random_mask.py:5-15)."""
    key = jax.random.PRNGKey(3)
    B, N = 64, 100
    valid = jnp.concatenate([jnp.full((B // 2,), 40, jnp.int32),
                             jnp.full((B // 2,), 100, jnp.int32)])
    m = block_token_mask(key, B, N, 0.65, span=5, valid=valid)
    # nothing masked beyond a sample's valid length + span overhang
    assert not bool(m[: B // 2, 44:].any())
    # masked fraction inside the valid region is comparable for short
    # and long samples (span count scales with valid length)
    frac_short = float(m[: B // 2, :40].mean())
    frac_long = float(m[B // 2:, :].mean())
    assert 0.3 < frac_short <= 0.75
    assert abs(frac_short - frac_long) < 0.15
    # at least min_masks spans even for tiny valid lengths
    tiny = block_token_mask(key, 4, N, 0.65, span=5,
                            valid=jnp.full((4,), 8, jnp.int32))
    assert int(tiny[:, :12].sum(axis=1).min()) >= 5


def test_uniform_mask_respects_valid():
    key = jax.random.PRNGKey(4)
    B, N = 32, 100
    valid = jnp.full((B,), 30, jnp.int32)
    m = uniform_span_mask(key, B, N, 0.65, span=5, valid=valid)
    # fairseq clips mask indices at the valid length (idx < sz)
    assert not bool(m[:, 30:].any())
    assert float(m[:, :30].mean()) > 0.2


def test_sample_crop_lengths_fixed_and_range():
    k = jax.random.PRNGKey(0)
    fixed = sample_crop_lengths(k, 8, 6.0, 6.0)
    assert np.all(np.asarray(fixed) == 96000)
    rng = sample_crop_lengths(k, 1000, 5.0, 7.0)
    r = np.asarray(rng)
    assert r.min() >= 5 * 16000 and r.max() <= 7 * 16000
    assert r.std() > 0


def test_rrc_freq_only_fast_path_exact():
    """The pure-freq-warp fast path (vc=(1,1), time_scale=(1,1)) must be
    bit-identical to the general canvas+2-D-bicubic path: the time pass
    weights are exactly (0,1,0,0) there. Compare against a copy of the
    general machinery driven with the same key."""
    import jax
    import jax.numpy as jnp
    from audiossl_tpu.ops.interpolate import sample_bicubic_2d
    from audiossl_tpu.transforms.augment import random_resize_crop

    rng = np.random.RandomState(0)
    B, F, T = 3, 64, 101
    spec = jnp.asarray(rng.randn(B, F, T).astype(np.float32))
    valid = jnp.asarray([101, 80, 55])
    key = jax.random.PRNGKey(7)

    got = random_resize_crop(key, spec, virtual_crop_scale=(1.0, 1.0),
                             freq_scale=(0.6, 1.5),
                             time_scale=(1.0, 1.0), valid_frames=valid)

    # general path, transcribed (pre-fast-path behavior)
    W = jnp.clip(valid, 1, T)
    CH, CW = F, T
    CWv = jnp.maximum(W, W)
    x0 = (CWv - W) // 2
    canvas = jnp.zeros((B, CH, CW), spec.dtype)
    place = jax.vmap(
        lambda c, s, xo: jax.lax.dynamic_update_slice(c, s, (0, xo)))
    canvas = place(canvas, spec, x0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    h = jnp.clip((jax.random.uniform(k1, (B,), minval=0.6, maxval=1.5)
                  * F).astype(jnp.int32), 1, CH)
    w = jnp.clip((jax.random.uniform(k2, (B,), minval=1.0, maxval=1.0)
                  * W.astype(jnp.float32)).astype(jnp.int32), 1, CWv)
    iy = (jax.random.uniform(k3, (B,))
          * (CH - h + 1).astype(jnp.float32)).astype(jnp.int32)
    ix = (jax.random.uniform(k4, (B,))
          * (CWv - w + 1).astype(jnp.float32)).astype(jnp.int32)
    jF = jnp.arange(F, dtype=jnp.float32)[None, :]
    ys = iy[:, None].astype(jnp.float32) + jF * (
        (h.astype(jnp.float32) - 1.0) / max(F - 1, 1))[:, None]
    jT = jnp.arange(T, dtype=jnp.float32)[None, :]
    xs = ix[:, None].astype(jnp.float32) + jT * (
        (w.astype(jnp.float32) - 1.0)
        / jnp.maximum(W.astype(jnp.float32) - 1.0, 1.0))[:, None]
    want = sample_bicubic_2d(canvas, ys, xs, y_lo=iy, y_hi=iy + h - 1,
                             x_lo=ix, x_hi=ix + w - 1)
    want = jnp.where(jnp.arange(T)[None, None, :] < W[:, None, None],
                     want, 0.0)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def _fairseq_static_mask_np(rng, n, ratio, span, min_masks=2):
    """Numpy transliteration of fairseq compute_mask_indices
    (mask_type="static", no_overlap=False, min_space=0, no padding) —
    the exact algorithm the reference wraps in random_mask.get_mask
    (reference methods/atstframe/random_mask.py:5-15). Oracle for the
    distributional-equivalence claim of ops/masking.block_token_mask."""
    num_mask = int(ratio * n / float(span) + rng.rand())
    num_mask = max(min_masks, num_mask)
    min_len = span
    if n - min_len <= num_mask:
        min_len = n - num_mask - 1
    starts = rng.choice(n - min_len, num_mask, replace=False)
    idx = np.asarray([i + j for i in starts for j in range(span)])
    mask = np.zeros(n, bool)
    mask[np.unique(idx[idx < n])] = True
    return mask


def test_block_mask_distribution_matches_fairseq_static():
    """block_token_mask's per-sample masked-fraction distribution matches
    the fairseq static algorithm (documented equivalences: deterministic
    vs randomized span-count rounding, with- vs without-replacement
    starts) within tight statistical tolerance, and start positions are
    uniform over the same range."""
    import jax

    n, ratio, span = 250, 0.65, 5
    B = 512
    ours = np.asarray(
        make_token_mask(jax.random.PRNGKey(0), B, n, ratio,
                        mask_type="block", span=span))
    rng = np.random.RandomState(0)
    ref = np.stack([_fairseq_static_mask_np(rng, n, ratio, span)
                    for _ in range(B)])

    ours_frac = ours.mean(axis=1)
    ref_frac = ref.mean(axis=1)
    # means within 2 points of masked fraction (~0.55 vs ~0.55-0.58)
    assert abs(ours_frac.mean() - ref_frac.mean()) < 0.02, (
        ours_frac.mean(), ref_frac.mean())
    # spread of per-sample coverage comparable (same union-of-spans
    # process up to the documented rounding/replacement differences)
    assert abs(ours_frac.std() - ref_frac.std()) < 0.015, (
        ours_frac.std(), ref_frac.std())
    # positional uniformity: per-token mask probability flat in the
    # interior for both (edges dip because spans start in [0, n-span])
    interior = slice(span, n - span)
    p_ours = ours[:, interior].mean(axis=0)
    p_ref = ref[:, interior].mean(axis=0)
    assert abs(p_ours.mean() - p_ref.mean()) < 0.03
    assert p_ours.std() < 0.05 and p_ref.std() < 0.05


def _fairseq_uniform_mask_np(rng, n, ratio, span, min_span, min_masks=2):
    """fairseq compute_mask_indices mask_type="uniform" transliteration:
    count divides by mask_length (span), lengths ~ U[min_span, 2*span],
    starts without replacement from [0, n - min(lengths))."""
    num_mask = max(min_masks, int(ratio * n / float(span) + rng.rand()))
    lengths = rng.randint(min_span, 2 * span + 1, size=num_mask)
    min_len = lengths.min()
    if n - min_len <= num_mask:
        min_len = n - num_mask - 1
    starts = rng.choice(n - min_len, num_mask, replace=False)
    idx = np.asarray([s + j for s, L in zip(starts, lengths)
                      for j in range(L)])
    mask = np.zeros(n, bool)
    mask[np.unique(idx[idx < n])] = True
    return mask


def test_uniform_mask_distribution_matches_fairseq():
    """uniform_span_mask matches fairseq's uniform mode statistically —
    including the surprising fairseq behavior that the span COUNT
    divides by mask_length while mean drawn length is (min+2*span)/2,
    so effective coverage exceeds the nominal ratio."""
    import jax

    n, ratio, span, min_span = 250, 0.65, 5, 2
    B = 512
    ours = np.asarray(
        make_token_mask(jax.random.PRNGKey(3), B, n, ratio,
                        mask_type="uniform", span=span,
                        min_span=min_span))
    rng = np.random.RandomState(3)
    ref = np.stack([_fairseq_uniform_mask_np(rng, n, ratio, span,
                                             min_span)
                    for _ in range(B)])
    of, rf = ours.mean(axis=1), ref.mean(axis=1)
    assert abs(of.mean() - rf.mean()) < 0.02, (of.mean(), rf.mean())
    assert abs(of.std() - rf.std()) < 0.02, (of.std(), rf.std())


def test_rrc_random_box_matches_torch_reference():
    """Per-sample traced-coordinate bicubic vs the reference's exact
    computation (crop a random box out of the centered virtual canvas,
    F.interpolate bicubic align_corners=True — byol_a.py:34-49) at
    matched box parameters, full valid width."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as tF
    from audiossl_tpu.ops.interpolate import sample_bicubic_2d

    rng = np.random.RandomState(5)
    F_, T = 64, 96
    vc = (1.0, 1.5)
    CH, CW = int(F_ * vc[0]), int(T * vc[1])
    for trial in range(5):
        spec = rng.randn(1, F_, T).astype(np.float32)
        # reference forward with a fixed box
        h = int(rng.uniform(0.6, 1.5) * F_)
        w = int(rng.uniform(0.6, 1.5) * T)
        h, w = min(h, CH), min(w, CW)
        i = rng.randint(0, CH - h + 1)
        j = rng.randint(0, CW - w + 1)
        canvas_t = torch.zeros((1, CH, CW))
        y0, x0 = (CH - F_) // 2, (CW - T) // 2
        canvas_t[:, y0:y0 + F_, x0:x0 + T] = torch.from_numpy(spec)
        crop = canvas_t[:, i:i + h, j:j + w]
        want = tF.interpolate(crop.unsqueeze(0), size=(F_, T),
                              mode="bicubic",
                              align_corners=True).squeeze(0).numpy()

        # ours: same canvas, same box, traced coordinates
        canvas = jnp.asarray(canvas_t.numpy())
        ys = (i + np.arange(F_) * (h - 1) / max(F_ - 1, 1))[None, :]
        xs = (j + np.arange(T) * (w - 1) / max(T - 1, 1))[None, :]
        got = sample_bicubic_2d(
            canvas, jnp.asarray(ys, jnp.float32),
            jnp.asarray(xs, jnp.float32),
            y_lo=jnp.asarray([i]), y_hi=jnp.asarray([i + h - 1]),
            x_lo=jnp.asarray([j]), x_hi=jnp.asarray([j + w - 1]))
        # f32 accumulation-order noise between torch's separable
        # passes and ours is ~5e-5; no semantic difference
        np.testing.assert_allclose(np.asarray(got)[0], want[0],
                                   atol=2e-4)


def test_block_mask_short_sequence_fallback_matches_fairseq():
    """For short valid lengths (sz - span <= num_mask) fairseq widens
    the start range to num_mask + 1 instead of collapsing every start
    to 0; block_token_mask must reproduce that distribution (VERDICT
    r3 review finding: the fallback was missing, so valid=6/span=5
    pinned all spans at position 0)."""
    import jax

    # n=6, span=5: sz - span = 1 <= num_mask = 2 triggers the fallback
    # (n=8 would NOT: 8-5=3 > 2)
    n, ratio, span = 6, 0.65, 5
    B = 2048
    ours = np.asarray(
        make_token_mask(jax.random.PRNGKey(1), B, n, ratio,
                        mask_type="block", span=span))
    rng = np.random.RandomState(1)
    ref = np.stack([_fairseq_static_mask_np(rng, n, ratio, span)
                    for _ in range(B)])
    # without the fallback both spans start at 0 -> token 0 always
    # masked (p=1.0) and token 5 never (p=0.0); fairseq draws starts
    # from {0,1,2} giving p(token 0) ~ 2/3, p(token 5) ~ 2/3... = 1
    p_ours = ours.mean(axis=0)
    p_ref = ref.mean(axis=0)
    assert np.abs(p_ours - p_ref).max() < 0.04, (p_ours, p_ref)
    assert abs(ours.mean() - ref.mean()) < 0.02
