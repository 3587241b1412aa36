"""Label-aware mixup (reference ``transforms/target_transform.py``).

``MixupSpecLabel`` (memory-bank) and ``MixupWavLabel`` become the
in-batch ``mixup_spec_label`` / ``mixup_wav_label``: mix each item with
a rolled partner, lambda ~ Beta(alpha, alpha), labels mixed with the
same lambda. ``MixupSpecLabelAudioset`` (second item sampled from the
dataset, target_transform.py:94-138) maps to the same in-batch form —
under a shuffled loader the rolled partner IS a random dataset item.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-7


def _lam(key, batch: int, alpha: float):
    return jax.random.beta(key, alpha, alpha, (batch,))


def mixup_spec_label(key, spec: jnp.ndarray, label: jnp.ndarray,
                     alpha: float = 10.0):
    """spec [B, F, T] log-domain, label [B, C] one/many-hot ->
    exp-domain mixed spec + linearly mixed labels."""
    k1, k2 = jax.random.split(key)
    B = spec.shape[0]
    lam = _lam(k1, B, alpha)
    shift = jax.random.randint(k2, (), 1, max(B, 2))
    spec2 = jnp.roll(spec, shift, axis=0)
    label2 = jnp.roll(label, shift, axis=0)
    l3 = lam[:, None, None]
    mixed = jnp.log(l3 * jnp.exp(spec) + (1 - l3) * jnp.exp(spec2) + _EPS)
    y = lam[:, None] * label + (1 - lam[:, None]) * label2
    return mixed, y


def mixup_wav_label(key, wav: jnp.ndarray, label: jnp.ndarray,
                    alpha: float = 10.0):
    """Waveform-domain mixup (reference MixupWavLabel,
    target_transform.py:11-50)."""
    k1, k2 = jax.random.split(key)
    B = wav.shape[0]
    lam = _lam(k1, B, alpha)
    shift = jax.random.randint(k2, (), 1, max(B, 2))
    wav2 = jnp.roll(wav, shift, axis=0)
    label2 = jnp.roll(label, shift, axis=0)
    mixed = lam[:, None] * wav + (1 - lam[:, None]) * wav2
    y = lam[:, None] * label + (1 - lam[:, None]) * label2
    return mixed, y
