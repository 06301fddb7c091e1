"""Spectral primitives with the reference FFT conventions.

The reference (``/root/reference/src/correlation_flow.cc:53-77``) uses FFTW's
single-precision r2c/c2r transforms over column-major Eigen arrays with the
axis order reversed in the FFTW call, storing the non-negative half of the
spectrum along the *row* axis, and normalizing the inverse by ``1/N``.

We use ``jnp.fft.rfft2``/``irfft2`` over row-major ``(..., H, W)`` arrays
(half spectrum along the *last* axis).  Every consumer of these spectra in
the KCC pipeline is either an elementwise spectral product followed by an
inverse transform (circular correlation) or the magnitude spectrum of a real
image — both are invariant to which axis carries the halved spectrum, so the
spatial-domain results match the reference bit-for-bit up to float rounding.

The inverse transform normalizes by ``1/(H*W)`` exactly like the reference's
``IFFT`` (``src/correlation_flow.cc:76``: ``x / x.size()``), which is also
numpy's default ``irfft2`` normalization.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def c2r(x: jnp.ndarray) -> jnp.ndarray:
    """Complex (..., N) → float32 (..., N, 2) real view.

    Persistent state (keyframe banks, tracking carries, checkpoints) stores
    spectra in this form: some TPU runtimes implement gather/scatter and
    host transfers only for real dtypes, and float storage is universally
    portable.  Complex values exist only transiently inside a jitted
    program between :func:`rfft2` and its consumers; XLA fuses these view
    conversions into the neighboring ops for free.
    """
    return jnp.stack([jnp.real(x), jnp.imag(x)], axis=-1)


def r2c(y: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`c2r`: float32 (..., N, 2) → complex64 (..., N)."""
    return jax.lax.complex(y[..., 0], y[..., 1])


def rfft2(x: jnp.ndarray) -> jnp.ndarray:
    """Real 2D FFT over the last two axes; spectrum shape ``(..., H, W//2+1)``.

    Matches ``CorrelationFlow::FFT`` (/root/reference/src/correlation_flow.cc:53-63)
    up to the (irrelevant) choice of halved axis.
    """
    return jnp.fft.rfft2(x.astype(jnp.float32))


def irfft2(xf: jnp.ndarray, shape: tuple[int, int]) -> jnp.ndarray:
    """Inverse of :func:`rfft2` with explicit spatial ``shape=(H, W)``.

    Includes the ``1/N`` normalization of ``CorrelationFlow::IFFT``
    (/root/reference/src/correlation_flow.cc:65-77).
    """
    return jnp.fft.irfft2(xf, s=shape)


def fftshift2(x: jnp.ndarray) -> jnp.ndarray:
    """fftshift over the last two axes.

    Replaces the reference's Eigen expression-template ``fftshift``
    (/root/reference/include/circ_shift.h:238-252).
    """
    return jnp.fft.fftshift(x, axes=(-2, -1))


def impulse_spectrum(h: int, w: int) -> jnp.ndarray:
    """Spectrum of a centered unit impulse: the KCC target response ``g``.

    Matches ``CorrelationFlow::GetTargetFFT`` (/root/reference/src/
    correlation_flow.cc:46-51): a delta at ``(h//2, w//2)``.  Computed in
    closed form — the DFT of ``delta[h//2, w//2]`` is
    ``exp(-2πi (k·h/2/H + l·w/2/W))`` which for even sizes is ``(-1)^(k+l)``
    restricted to the stored half spectrum.
    """
    target = jnp.zeros((h, w), jnp.float32).at[h // 2, w // 2].set(1.0)
    return jnp.fft.rfft2(target)
