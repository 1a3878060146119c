"""Bit-exact int16 radix-2 FFT, vectorized for the TPU VPU.

TPU-native rebuild of the reference fixed-point FFT stack
(reference: aecm/complex_fft.c:241-491, aecm/real_fft.c:47-102).

Design notes (why this is not a translation):
  * The C code runs a triple nested loop over (stage, twiddle m, butterfly i)
    mutating an interleaved int16 buffer in place.  Here each stage is ONE
    vectorized butterfly: the 128-point buffer is viewed as
    (groups, 2, half) so every butterfly in a stage executes as a single
    fused VPU op, with the (static) twiddle vector broadcast over groups.
    Seven such stages unroll at trace time into one XLA graph.
  * The bit-reversal pass (complex_fft.c:181-238) becomes a static gather
    permutation.
  * The inverse FFT's data-dependent per-stage scaling
    (complex_fft.c:382-396) — shift chosen from the running max-abs of the
    evolving buffer — becomes a per-stage reduction feeding elementwise
    selects; functionally identical, still one fused graph.
  * Everything carries a leading batch shape: all ops broadcast over `...`,
    so `vmap`/sharding across thousands of streams is free.

Data layout: real/imag as separate int32 arrays of shape (..., 128) holding
int16-range values (C's interleaved int16 buffer, de-interleaved for lanes).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import spl
from ..defines import CFFTSFT, CFFTRND, CFFTRND2, CIFFTSFT, CIFFTRND

I32 = jnp.int32
U32 = jnp.uint32

ORDER = 7           # 128-point FFT (aecm_defines.h PART_LEN_SHIFT)
N = 1 << ORDER

# Q15 sine table (complex_fft.c:28-142).  Regenerated from its closed form
# trunc(32767 * sin(2*pi*k/1024)); verified bit-identical to the reference
# table by tests/test_fft.py golden comparisons.
SIN_TABLE_1024 = np.trunc(np.sin(2.0 * np.pi * np.arange(1024) / 1024.0)
                          * 32767.0).astype(np.int32)


def _bit_reverse_perm(order: int) -> np.ndarray:
    n = 1 << order
    perm = np.zeros(n, dtype=np.int32)
    for i in range(n):
        r = 0
        for b in range(order):
            if i & (1 << b):
                r |= 1 << (order - 1 - b)
        perm[i] = r
    return perm


BITREV_128 = jnp.array(_bit_reverse_perm(ORDER))


def _stage_twiddles(order: int):
    """Static (wr, wi-magnitude) twiddle vectors per stage.

    Stage s has half-length l = 2^s; twiddle index j = m << k with
    k = 9 - s (complex_fft.c:254,263).  Returns lists of np arrays of
    length l: wr[m] = sin[j+256], ws[m] = sin[j].
    """
    wr_list, ws_list = [], []
    k = 9
    l = 1
    while l < (1 << order):
        m = np.arange(l)
        j = m << k
        wr_list.append(SIN_TABLE_1024[j + 256].astype(np.int32))
        ws_list.append(SIN_TABLE_1024[j].astype(np.int32))
        k -= 1
        l <<= 1
    return ([jnp.array(w) for w in wr_list], [jnp.array(w) for w in ws_list])


_STAGE_WR, _STAGE_WS = _stage_twiddles(ORDER)


def _butterfly_view(x, l):
    """Reshape (..., N) -> (..., N//(2l), 2, l): axis -2 selects top/bottom."""
    return x.reshape(x.shape[:-1] + (N // (2 * l), 2, l))


# ---------------------------------------------------------------------------
# Batched-major kernels: streams on VPU lanes.
#
# Under `vmap`, the stage reshapes above act on the minor (lane) axis with
# tiny tile widths (l = 1, 2, 4, ...), which XLA lowers to a full cross-lane
# relayout per stage (~500 us per FFT at B=1024 on v5e).  The batched rules
# below instead transpose once to (128, B) so every butterfly is a reshape
# over MAJOR axes (free) and all elementwise work has the batch on lanes.
# `custom_vmap` dispatches to these whenever the input carries a batch axis;
# semantics are bit-identical (same integer ops, different layout).
# ---------------------------------------------------------------------------

def _bmaj_view(x, l):
    """(N, B) -> (N//(2l), 2, l, B): major-axis butterfly view (no relayout)."""
    return x.reshape((N // (2 * l), 2, l, x.shape[-1]))


def _complex_fft_bmaj(fr, fi):
    """complex_fft on (N, B) major-layout arrays."""
    for s in range(ORDER):
        l = 1 << s
        wr = _STAGE_WR[s][:, None]
        wi = -_STAGE_WS[s][:, None]
        r = _bmaj_view(fr, l)
        im = _bmaj_view(fi, l)
        ar, br = r[:, 0], r[:, 1]
        ai, bi = im[:, 0], im[:, 1]
        tr = (wr * br - wi * bi + CFFTRND) >> (15 - CFFTSFT)
        ti = (wr * bi + wi * br + CFFTRND) >> (15 - CFFTSFT)
        qr = (ar.astype(U32) << U32(CFFTSFT)).astype(I32)
        qi = (ai.astype(U32) << U32(CFFTSFT)).astype(I32)
        new_br = spl.to_w16((qr - tr + CFFTRND2) >> (1 + CFFTSFT))
        new_bi = spl.to_w16((qi - ti + CFFTRND2) >> (1 + CFFTSFT))
        new_ar = spl.to_w16((qr + tr + CFFTRND2) >> (1 + CFFTSFT))
        new_ai = spl.to_w16((qi + ti + CFFTRND2) >> (1 + CFFTSFT))
        fr = jnp.stack([new_ar, new_br], axis=1).reshape(fr.shape)
        fi = jnp.stack([new_ai, new_bi], axis=1).reshape(fi.shape)
    return fr, fi


def _complex_ifft_bmaj(fr, fi):
    """complex_ifft on (N, B) major-layout arrays; returns (fr, fi, scale(B,))."""
    scale = jnp.zeros(fr.shape[-1:], dtype=I32)
    for s in range(ORDER):
        l = 1 << s
        # MaxAbsValueW16 over the major axis (values already int16-range).
        maxabs = jnp.minimum(
            jnp.maximum(jnp.max(jnp.abs(fr), axis=0),
                        jnp.max(jnp.abs(fi), axis=0)),
            I32(32767))
        shift = ((maxabs > 13573).astype(I32) + (maxabs > 27146).astype(I32))
        scale = scale + shift
        round2 = (I32(8192).astype(U32) << shift.astype(U32)).astype(I32)

        wr = _STAGE_WR[s][:, None]
        wi = _STAGE_WS[s][:, None]
        r = _bmaj_view(fr, l)
        im = _bmaj_view(fi, l)
        ar, br = r[:, 0], r[:, 1]
        ai, bi = im[:, 0], im[:, 1]
        tr = (wr * br - wi * bi + CIFFTRND) >> (15 - CIFFTSFT)
        ti = (wr * bi + wi * br + CIFFTRND) >> (15 - CIFFTSFT)
        qr = (ar.astype(U32) << U32(CIFFTSFT)).astype(I32)
        qi = (ai.astype(U32) << U32(CIFFTSFT)).astype(I32)
        new_br = spl.to_w16((qr - tr + round2) >> (shift + CIFFTSFT))
        new_bi = spl.to_w16((qi - ti + round2) >> (shift + CIFFTSFT))
        new_ar = spl.to_w16((qr + tr + round2) >> (shift + CIFFTSFT))
        new_ai = spl.to_w16((qi + ti + round2) >> (shift + CIFFTSFT))
        fr = jnp.stack([new_ar, new_br], axis=1).reshape(fr.shape)
        fi = jnp.stack([new_ai, new_bi], axis=1).reshape(fi.shape)
    return fr, fi, scale


def complex_fft(fr, fi):
    """WebRtcSpl_ComplexFFT, mode 1 (complex_fft.c:293-357).

    In/out: int32 arrays (..., 128) of int16-range values, natural order
    expected to be ALREADY bit-reversed by the caller (as in the C flow).
    Returns (fr, fi); scale factor is fixed (0 returned by the C code).
    """
    fr = fr.astype(I32)
    fi = fi.astype(I32)
    for s in range(ORDER):
        l = 1 << s
        wr = _STAGE_WR[s]
        wi = -_STAGE_WS[s]
        r = _butterfly_view(fr, l)
        im = _butterfly_view(fi, l)
        ar, br = r[..., 0, :], r[..., 1, :]
        ai, bi = im[..., 0, :], im[..., 1, :]
        tr = (wr * br - wi * bi + CFFTRND) >> (15 - CFFTSFT)
        ti = (wr * bi + wi * br + CFFTRND) >> (15 - CFFTSFT)
        qr = (ar.astype(U32) << U32(CFFTSFT)).astype(I32)
        qi = (ai.astype(U32) << U32(CFFTSFT)).astype(I32)
        new_br = spl.to_w16((qr - tr + CFFTRND2) >> (1 + CFFTSFT))
        new_bi = spl.to_w16((qi - ti + CFFTRND2) >> (1 + CFFTSFT))
        new_ar = spl.to_w16((qr + tr + CFFTRND2) >> (1 + CFFTSFT))
        new_ai = spl.to_w16((qi + ti + CFFTRND2) >> (1 + CFFTSFT))
        fr = jnp.stack([new_ar, new_br], axis=-2).reshape(fr.shape)
        fi = jnp.stack([new_ai, new_bi], axis=-2).reshape(fi.shape)
    return fr, fi


def complex_ifft(fr, fi):
    """WebRtcSpl_ComplexIFFT, mode 1 (complex_fft.c:361-491).

    Returns (fr, fi, scale): per-stage data-dependent scaling replicated via
    a max-abs reduction over BOTH real and imag parts each stage
    (the C MaxAbsValueW16 over the interleaved 2n buffer).
    """
    fr = fr.astype(I32)
    fi = fi.astype(I32)
    scale = jnp.zeros(fr.shape[:-1], dtype=I32)
    for s in range(ORDER):
        l = 1 << s
        maxabs = jnp.maximum(spl.max_abs_value_w16(fr), spl.max_abs_value_w16(fi))
        shift = ((maxabs > 13573).astype(I32) + (maxabs > 27146).astype(I32))
        scale = scale + shift
        round2 = (I32(8192).astype(U32) << shift.astype(U32)).astype(I32)
        shift_b = shift[..., None, None]
        round2_b = round2[..., None, None]

        wr = _STAGE_WR[s]
        wi = _STAGE_WS[s]
        r = _butterfly_view(fr, l)
        im = _butterfly_view(fi, l)
        ar, br = r[..., 0, :], r[..., 1, :]
        ai, bi = im[..., 0, :], im[..., 1, :]
        tr = (wr * br - wi * bi + CIFFTRND) >> (15 - CIFFTSFT)
        ti = (wr * bi + wi * br + CIFFTRND) >> (15 - CIFFTSFT)
        qr = (ar.astype(U32) << U32(CIFFTSFT)).astype(I32)
        qi = (ai.astype(U32) << U32(CIFFTSFT)).astype(I32)
        new_br = spl.to_w16((qr - tr + round2_b) >> (shift_b + CIFFTSFT))
        new_bi = spl.to_w16((qi - ti + round2_b) >> (shift_b + CIFFTSFT))
        new_ar = spl.to_w16((qr + tr + round2_b) >> (shift_b + CIFFTSFT))
        new_ai = spl.to_w16((qi + ti + round2_b) >> (shift_b + CIFFTSFT))
        fr = jnp.stack([new_ar, new_br], axis=-2).reshape(fr.shape)
        fi = jnp.stack([new_ai, new_bi], axis=-2).reshape(fi.shape)
    return fr, fi, scale


@jax.custom_batching.custom_vmap
def real_forward_fft(real_in):
    """WebRtcSpl_RealForwardFFT (real_fft.c:47-72) for order 7.

    Args:  real_in: (128,) int32 (int16-range) time samples (batch via vmap).
    Returns: (re, im) of shape (65,) — the unique CCS bins 0..64.
    """
    fr = jnp.take(real_in.astype(I32), BITREV_128, axis=-1)
    fi = jnp.zeros_like(fr)
    fr, fi = complex_fft(fr, fi)
    return fr[..., : N // 2 + 1], fi[..., : N // 2 + 1]


@real_forward_fft.def_vmap
def _real_forward_fft_vmap(axis_size, in_batched, real_in):
    """Batched rule: run in (128, B) major layout (streams on lanes)."""
    if not in_batched[0]:
        real_in = jnp.broadcast_to(real_in, (axis_size,) + real_in.shape)
    x = real_in.reshape(axis_size, N).T.astype(I32)   # (128, B)
    fr = x[BITREV_128, :]
    fi = jnp.zeros_like(fr)
    fr, fi = _complex_fft_bmaj(fr, fi)
    re = fr[: N // 2 + 1].T
    im = fi[: N // 2 + 1].T
    return (re, im), (True, True)


@jax.custom_batching.custom_vmap
def real_inverse_fft(re, im):
    """WebRtcSpl_RealInverseFFT (real_fft.c:74-102) for order 7.

    Args:  re, im: (65,) CCS spectrum bins (batch via vmap).
    Returns: (real_out, scale): (128,) time samples and the total
    right-shift applied by the variable-scaling IFFT.
    """
    # Conjugate-symmetric reconstruction of bins 65..127 from bins 63..1.
    # The negation wraps like the C int16 store (real_fft.c:84-90):
    # an imag of -32768 (reachable via CNG saturation) must stay -32768.
    tail_re = re[..., 1:-1][..., ::-1]
    tail_im = spl.to_w16(-im[..., 1:-1][..., ::-1])
    fr = jnp.concatenate([re.astype(I32), tail_re.astype(I32)], axis=-1)
    fi = jnp.concatenate([im.astype(I32), tail_im.astype(I32)], axis=-1)
    fr = jnp.take(fr, BITREV_128, axis=-1)
    fi = jnp.take(fi, BITREV_128, axis=-1)
    fr, fi, scale = complex_ifft(fr, fi)
    return fr, scale


@real_inverse_fft.def_vmap
def _real_inverse_fft_vmap(axis_size, in_batched, re, im):
    """Batched rule: (128, B) major layout, per-lane adaptive IFFT scaling."""
    if not in_batched[0]:
        re = jnp.broadcast_to(re, (axis_size,) + re.shape)
    if not in_batched[1]:
        im = jnp.broadcast_to(im, (axis_size,) + im.shape)
    re_t = re.T.astype(I32)      # (65, B)
    im_t = im.T.astype(I32)
    tail_re = re_t[1:-1][::-1]
    tail_im = spl.to_w16(-im_t[1:-1][::-1])  # int16 wrap, as in the primal
    fr = jnp.concatenate([re_t, tail_re], axis=0)
    fi = jnp.concatenate([im_t, tail_im], axis=0)
    fr = fr[BITREV_128, :]
    fi = fi[BITREV_128, :]
    fr, fi, scale = _complex_ifft_bmaj(fr, fi)
    return (fr.T, scale), (True, True)
