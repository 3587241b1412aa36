"""Quantified equivalence: in-batch per-sample-partner mixup vs the
reference's worker-local FIFO memory bank (reference
transforms/byol_a.py:94-115 — z drawn uniformly from the last <=2000
inputs seen by that DataLoader worker, alpha = ratio*U(0,1) per
sample).

Our `mixup_log` draws z independently per sample from the OTHER
members of the (shuffled) batch. Both schemes share the mixing
formula; the only difference is the partner distribution, which these
tests bound empirically. Measured numbers are cited in PARITY.md §2.1.
"""
import jax
import numpy as np

from audiossl_tpu.transforms.augment import mixup_log

D = 256          # dataset size
B = 32           # batch size
EPOCHS = 60      # epochs simulated for the marginal statistics


def _inbatch_partner_counts(rng):
    """Partner-index marginal over the dataset for the in-batch scheme
    (shuffled batches, per-sample partner uniform over other members)."""
    counts = np.zeros((D, D), np.int64)
    for _ in range(EPOCHS):
        order = rng.permutation(D)
        for b in range(D // B):
            idx = order[b * B:(b + 1) * B]
            shift = rng.randint(1, B, size=B)
            partner = idx[(np.arange(B) + shift) % B]
            counts[idx, partner] += 1
    return counts


def _fifo_partner_counts(rng, n_memory=2000):
    """The reference scheme: one worker stream, FIFO bank of previous
    inputs, uniform draw (first item is returned unmixed: empty bank)."""
    counts = np.zeros((D, D), np.int64)
    unmixed = 0
    bank = []
    for _ in range(EPOCHS):
        order = rng.permutation(D)
        for i in order:
            if bank:
                counts[i, bank[rng.randint(len(bank))]] += 1
            else:
                unmixed += 1
            bank = (bank + [i])[-n_memory:]
    return counts, unmixed


def test_partner_marginal_matches_fifo():
    """Both schemes give (a) zero self-mixing, (b) a partner marginal
    uniform over the dataset to the same tolerance."""
    rng = np.random.RandomState(0)
    ours = _inbatch_partner_counts(rng)
    fifo, unmixed = _fifo_partner_counts(np.random.RandomState(1))

    # (a) self-mixing: never in-batch; the FIFO CAN mix an item with a
    # previous-epoch copy of itself at rate ~1/min(bank, D) (on real
    # AudioSet, bank 2000 over ~2M clips -> ~1e-3 and a different
    # random crop anyway), so the difference is bounded by that rate
    assert np.trace(ours) == 0
    fifo_self_rate = np.trace(fifo) / fifo.sum()
    assert fifo_self_rate < 2.0 / D
    # FIFO returns exactly one early sample unmixed (empty bank)
    assert unmixed == 1

    # (b) partner marginal: total-variation distance from uniform
    def tv_from_uniform(counts):
        p = counts.sum(axis=0).astype(np.float64)
        p /= p.sum()
        return 0.5 * np.abs(p - 1.0 / D).sum()

    tv_ours = tv_from_uniform(ours)
    tv_fifo = tv_from_uniform(fifo)
    # both are sampling noise around uniform at ~15k draws over 256
    # bins; measured: ours ~0.051, fifo ~0.052 (EPOCHS=60)
    assert tv_ours < 0.08 and tv_fifo < 0.08
    assert abs(tv_ours - tv_fifo) < 0.02


def test_mixed_output_distribution_matches_fifo():
    """End-to-end: mix CONSTANT per-item spectrograms under both
    partner schemes with identical alpha streams; the empirical
    distributions of the mixed values must agree (two-sample KS)."""
    rng = np.random.RandomState(2)
    vals = rng.randn(D).astype(np.float64)  # item i == constant vals[i]
    ratio = 0.4

    def mix(x, z, a):
        return np.log((1 - a) * np.exp(x) + a * np.exp(z)
                      + np.finfo(np.float32).eps)

    ours, fifo = [], []
    bank = []
    for _ in range(EPOCHS):
        order = rng.permutation(D)
        # in-batch
        for b in range(D // B):
            idx = order[b * B:(b + 1) * B]
            shift = rng.randint(1, B, size=B)
            partner = idx[(np.arange(B) + shift) % B]
            a = ratio * rng.rand(B)
            ours.extend(mix(vals[idx], vals[partner], a))
        # fifo (same item stream)
        for i in order:
            a = ratio * rng.rand()
            if bank:
                z = bank[rng.randint(len(bank))]
                fifo.append(mix(vals[i], vals[z], a))
            bank = (bank + [i])[-2000:]

    ours, fifo = np.sort(ours), np.sort(fifo)
    grid = np.linspace(vals.min(), vals.max(), 512)
    cdf_o = np.searchsorted(ours, grid) / len(ours)
    cdf_f = np.searchsorted(fifo, grid) / len(fifo)
    ks = np.abs(cdf_o - cdf_f).max()
    # measured KS ~0.004 at 15k samples/side; critical value at
    # alpha=0.001 is ~1.95*sqrt(2/15360) ~= 0.022
    assert ks < 0.022, f"mixed-output KS={ks:.4f}"


def test_mixup_log_per_sample_partners():
    """The jax implementation draws an INDEPENDENT partner per sample,
    not one batch-wide roll: recover the per-row mixing weight `a`
    assuming each candidate single shift; no single shift may explain
    every row with a valid a in [0, 1] for all keys."""
    import jax.numpy as jnp

    Bn, F, T = 16, 4, 4
    spec = jnp.broadcast_to(
        jnp.linspace(-2.0, 2.0, Bn)[:, None, None], (Bn, F, T))
    x = np.asarray(spec)[:, 0, 0]
    saw_non_roll = False
    for s in range(10):
        mixed = np.asarray(
            mixup_log(jax.random.PRNGKey(s), spec, ratio=1.0))[:, 0, 0]
        explained = False
        for shift in range(1, Bn):
            z = x[(np.arange(Bn) + shift) % Bn]
            with np.errstate(divide="ignore", invalid="ignore"):
                a = (np.exp(mixed) - np.exp(x)) / (np.exp(z) - np.exp(x))
            if np.all((a > -1e-5) & (a < 1 + 1e-5)):
                explained = True
        if not explained:
            saw_non_roll = True
    assert saw_non_roll
