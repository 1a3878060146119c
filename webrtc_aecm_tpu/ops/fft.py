"""Bit-exact int16 radix-2 FFT, vectorized for the TPU VPU.

TPU-native rebuild of the reference fixed-point FFT stack
(reference: aecm/complex_fft.c:241-491, aecm/real_fft.c:47-102).

Design notes (why this is not a translation):
  * The C code runs a triple nested loop over (stage, twiddle m, butterfly i)
    mutating an interleaved int16 buffer in place.  Here each stage is ONE
    vectorized butterfly: the 2^order-point buffer is viewed as
    (groups, 2, half) so every butterfly in a stage executes as a single
    fused VPU op, with the (static) twiddle vector broadcast over groups.
    The stages unroll at trace time into one XLA graph.
  * The bit-reversal pass (complex_fft.c:181-238) becomes a static gather
    permutation.
  * The inverse FFT's data-dependent per-stage scaling
    (complex_fft.c:382-396) — shift chosen from the running max-abs of the
    evolving buffer — becomes a per-stage reduction feeding elementwise
    selects; functionally identical, still one fused graph.
  * Everything carries a leading batch shape: all ops broadcast over `...`,
    so `vmap`/sharding across thousands of streams is free.

Full reference surface: both accuracy modes (mode 1 high-accuracy used by
AECM, mode 0 low-accuracy, complex_fft.c:257-291/400-438) and all orders up
to kMaxFFTOrder=10 (real_fft.h:18-20); AECM's hot path is (order=7, mode=1).

Data layout: real/imag as separate int32 arrays of shape (..., 2^order)
holding int16-range values (C's interleaved int16 buffer, de-interleaved
for lanes).
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from . import spl
from ..defines import CFFTSFT, CFFTRND, CFFTRND2, CIFFTSFT, CIFFTRND

I32 = jnp.int32
U32 = jnp.uint32

ORDER = 7           # 128-point FFT (aecm_defines.h PART_LEN_SHIFT)
N = 1 << ORDER
MAX_FFT_ORDER = 10  # kMaxFFTOrder (real_fft.h:18-20); sine table bound

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


@lru_cache(maxsize=None)
def _bitrev(order: int):
    return jnp.array(_bit_reverse_perm(order))


BITREV_128 = _bitrev(ORDER)


@lru_cache(maxsize=None)
def _stage_twiddles(order: int):
    """Static (wr, wi-magnitude) twiddle vectors per stage.

    Stage s has half-length l = 2^s; twiddle index j = m << k with
    k = 9 - s — the table stride starts at 9 regardless of order
    (complex_fft.c:254-256 'Do not change depending on stages').
    Returns lists of arrays of length l: wr[m] = sin[j+256], ws[m] = sin[j].
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
    return (tuple(jnp.array(w) for w in wr_list),
            tuple(jnp.array(w) for w in ws_list))


_STAGE_WR, _STAGE_WS = _stage_twiddles(ORDER)


def _butterfly_view(x, l):
    """Reshape (..., n) -> (..., n//(2l), 2, l): axis -2 selects top/bottom."""
    n = x.shape[-1]
    return x.reshape(x.shape[:-1] + (n // (2 * l), 2, l))


def _fft_stage(ar, ai, br, bi, wr, wi, mode, ifft_shift=None,
               ifft_round=None):
    """One butterfly stage in either accuracy mode.

    mode 1 forward: CFFTRND/CFFTSFT rounding (complex_fft.c:293-357);
    mode 0 forward: plain >>15 twiddle, >>1 per stage (:257-291);
    inverse (ifft_shift given): data-dependent shift; mode 1 rounds with
    CIFFTRND/round2 (:440-483), mode 0 truncates (:400-438).
    """
    if ifft_shift is None:  # forward
        if mode == 1:
            tr = (wr * br - wi * bi + CFFTRND) >> (15 - CFFTSFT)
            ti = (wr * bi + wi * br + CFFTRND) >> (15 - CFFTSFT)
            qr = (ar.astype(U32) << U32(CFFTSFT)).astype(I32)
            qi = (ai.astype(U32) << U32(CFFTSFT)).astype(I32)
            down = 1 + CFFTSFT
            rnd = CFFTRND2
        else:
            tr = (wr * br - wi * bi) >> 15
            ti = (wr * bi + wi * br) >> 15
            qr, qi = ar, ai
            down = 1
            rnd = 0
        return (spl.to_w16((qr + tr + rnd) >> down),
                spl.to_w16((qi + ti + rnd) >> down),
                spl.to_w16((qr - tr + rnd) >> down),
                spl.to_w16((qi - ti + rnd) >> down))
    # inverse
    if mode == 1:
        tr = (wr * br - wi * bi + CIFFTRND) >> (15 - CIFFTSFT)
        ti = (wr * bi + wi * br + CIFFTRND) >> (15 - CIFFTSFT)
        qr = (ar.astype(U32) << U32(CIFFTSFT)).astype(I32)
        qi = (ai.astype(U32) << U32(CIFFTSFT)).astype(I32)
        down = ifft_shift + CIFFTSFT
        rnd = ifft_round
    else:
        tr = (wr * br - wi * bi) >> 15
        ti = (wr * bi + wi * br) >> 15
        qr, qi = ar, ai
        down = ifft_shift
        rnd = 0
    return (spl.to_w16((qr + tr + rnd) >> down),
            spl.to_w16((qi + ti + rnd) >> down),
            spl.to_w16((qr - tr + rnd) >> down),
            spl.to_w16((qi - ti + rnd) >> down))


# ---------------------------------------------------------------------------
# Batched-major kernels: streams on VPU lanes.
#
# Under `vmap`, the stage reshapes above act on the minor (lane) axis with
# tiny tile widths (l = 1, 2, 4, ...), which XLA lowers to a full cross-lane
# relayout per stage (~500 us per FFT at B=1024 on v5e).  The batched rules
# below instead transpose once to (n, B) so every butterfly is a reshape
# over MAJOR axes (free) and all elementwise work has the batch on lanes.
# `custom_vmap` dispatches to these whenever the input carries a batch axis;
# semantics are bit-identical (same integer ops, different layout).
# ---------------------------------------------------------------------------

def _bmaj_view(x, l):
    """(n, B) -> (n//(2l), 2, l, B): major-axis butterfly view (no relayout)."""
    n = x.shape[0]
    return x.reshape((n // (2 * l), 2, l, x.shape[-1]))


def _complex_fft_bmaj(fr, fi, order: int = ORDER, mode: int = 1):
    """complex_fft on (n, B) major-layout arrays."""
    wr_t, ws_t = _stage_twiddles(order)
    for s in range(order):
        l = 1 << s
        wr = wr_t[s][:, None]
        wi = -ws_t[s][:, None]
        r = _bmaj_view(fr, l)
        im = _bmaj_view(fi, l)
        ar, br = r[:, 0], r[:, 1]
        ai, bi = im[:, 0], im[:, 1]
        new_ar, new_ai, new_br, new_bi = _fft_stage(
            ar, ai, br, bi, wr, wi, mode)
        fr = jnp.stack([new_ar, new_br], axis=1).reshape(fr.shape)
        fi = jnp.stack([new_ai, new_bi], axis=1).reshape(fi.shape)
    return fr, fi


def _complex_ifft_bmaj(fr, fi, order: int = ORDER, mode: int = 1):
    """complex_ifft on (n, B) major-layout arrays; returns (fr, fi, scale(B,))."""
    wr_t, ws_t = _stage_twiddles(order)
    scale = jnp.zeros(fr.shape[-1:], dtype=I32)
    for s in range(order):
        l = 1 << s
        # MaxAbsValueW16 over the major axis (values already int16-range).
        maxabs = jnp.minimum(
            jnp.maximum(jnp.max(jnp.abs(fr), axis=0),
                        jnp.max(jnp.abs(fi), axis=0)),
            I32(32767))
        shift = ((maxabs > 13573).astype(I32) + (maxabs > 27146).astype(I32))
        scale = scale + shift
        round2 = (I32(8192).astype(U32) << shift.astype(U32)).astype(I32)

        wr = wr_t[s][:, None]
        wi = ws_t[s][:, None]
        r = _bmaj_view(fr, l)
        im = _bmaj_view(fi, l)
        ar, br = r[:, 0], r[:, 1]
        ai, bi = im[:, 0], im[:, 1]
        new_ar, new_ai, new_br, new_bi = _fft_stage(
            ar, ai, br, bi, wr, wi, mode, ifft_shift=shift,
            ifft_round=round2)
        fr = jnp.stack([new_ar, new_br], axis=1).reshape(fr.shape)
        fi = jnp.stack([new_ai, new_bi], axis=1).reshape(fi.shape)
    return fr, fi, scale


def complex_fft(fr, fi, order: int = ORDER, mode: int = 1):
    """WebRtcSpl_ComplexFFT (complex_fft.c:241-359), both accuracy modes.

    In/out: int32 arrays (..., 2^order) of int16-range values, expected to
    be ALREADY bit-reversed by the caller (as in the C flow).
    Returns (fr, fi); the C scale return is a constant 0.
    """
    fr = fr.astype(I32)
    fi = fi.astype(I32)
    wr_t, ws_t = _stage_twiddles(order)
    for s in range(order):
        l = 1 << s
        wr = wr_t[s]
        wi = -ws_t[s]
        r = _butterfly_view(fr, l)
        im = _butterfly_view(fi, l)
        ar, br = r[..., 0, :], r[..., 1, :]
        ai, bi = im[..., 0, :], im[..., 1, :]
        new_ar, new_ai, new_br, new_bi = _fft_stage(
            ar, ai, br, bi, wr, wi, mode)
        fr = jnp.stack([new_ar, new_br], axis=-2).reshape(fr.shape)
        fi = jnp.stack([new_ai, new_bi], axis=-2).reshape(fi.shape)
    return fr, fi


def complex_ifft(fr, fi, order: int = ORDER, mode: int = 1):
    """WebRtcSpl_ComplexIFFT (complex_fft.c:361-491), both accuracy modes.

    Returns (fr, fi, scale): per-stage data-dependent scaling replicated via
    a max-abs reduction over BOTH real and imag parts each stage
    (the C MaxAbsValueW16 over the interleaved 2n buffer).
    """
    fr = fr.astype(I32)
    fi = fi.astype(I32)
    wr_t, ws_t = _stage_twiddles(order)
    scale = jnp.zeros(fr.shape[:-1], dtype=I32)
    for s in range(order):
        l = 1 << s
        maxabs = jnp.maximum(spl.max_abs_value_w16(fr),
                             spl.max_abs_value_w16(fi))
        shift = ((maxabs > 13573).astype(I32) + (maxabs > 27146).astype(I32))
        scale = scale + shift
        round2 = (I32(8192).astype(U32) << shift.astype(U32)).astype(I32)
        shift_b = shift[..., None, None]
        round2_b = round2[..., None, None]

        wr = wr_t[s]
        wi = ws_t[s]
        r = _butterfly_view(fr, l)
        im = _butterfly_view(fi, l)
        ar, br = r[..., 0, :], r[..., 1, :]
        ai, bi = im[..., 0, :], im[..., 1, :]
        new_ar, new_ai, new_br, new_bi = _fft_stage(
            ar, ai, br, bi, wr, wi, mode, ifft_shift=shift_b,
            ifft_round=round2_b)
        fr = jnp.stack([new_ar, new_br], axis=-2).reshape(fr.shape)
        fi = jnp.stack([new_ai, new_bi], axis=-2).reshape(fi.shape)
    return fr, fi, scale


@lru_cache(maxsize=None)
def make_real_fft(order: int = ORDER):
    """Real FFT pair for any order <= kMaxFFTOrder (real_fft.h:18-20).

    Returns (forward, inverse) with the same contracts as the module-level
    `real_forward_fft` / `real_inverse_fft` (which ARE the order-7
    instance).  The complex core always runs mode 1, as in the C wrapper
    (real_fft.c:66, :97).  Both carry custom_vmap batched-major rules.
    """
    if not (1 <= order <= MAX_FFT_ORDER):
        raise ValueError(f"order must be in [1, {MAX_FFT_ORDER}]")
    n = 1 << order
    bitrev = _bitrev(order)

    @jax.custom_batching.custom_vmap
    def real_forward_fft(real_in):
        """WebRtcSpl_RealForwardFFT (real_fft.c:47-72).

        Args:  real_in: (2^order,) int32 (int16-range) time samples
        (batch via vmap).
        Returns: (re, im) of shape (2^(order-1)+1,) — the unique CCS bins.
        """
        fr = jnp.take(real_in.astype(I32), bitrev, axis=-1)
        fi = jnp.zeros_like(fr)
        fr, fi = complex_fft(fr, fi, order)
        return fr[..., : n // 2 + 1], fi[..., : n // 2 + 1]

    @real_forward_fft.def_vmap
    def _real_forward_fft_vmap(axis_size, in_batched, real_in):
        """Batched rule: run in (n, B) major layout (streams on lanes)."""
        if not in_batched[0]:
            real_in = jnp.broadcast_to(real_in, (axis_size,) + real_in.shape)
        x = real_in.reshape(axis_size, n).T.astype(I32)   # (n, B)
        fr = x[bitrev, :]
        fi = jnp.zeros_like(fr)
        fr, fi = _complex_fft_bmaj(fr, fi, order)
        re = fr[: n // 2 + 1].T
        im = fi[: n // 2 + 1].T
        return (re, im), (True, True)

    @jax.custom_batching.custom_vmap
    def real_inverse_fft(re, im):
        """WebRtcSpl_RealInverseFFT (real_fft.c:74-102).

        Args:  re, im: (2^(order-1)+1,) CCS spectrum bins (batch via vmap).
        Returns: (real_out, scale): (2^order,) time samples and the total
        right-shift applied by the variable-scaling IFFT.
        """
        # Conjugate-symmetric reconstruction of the upper bins from the
        # lower ones.  The negation wraps like the C int16 store
        # (real_fft.c:84-90): an imag of -32768 (reachable via CNG
        # saturation) must stay -32768.
        tail_re = re[..., 1:-1][..., ::-1]
        tail_im = spl.to_w16(-im[..., 1:-1][..., ::-1])
        fr = jnp.concatenate([re.astype(I32), tail_re.astype(I32)], axis=-1)
        fi = jnp.concatenate([im.astype(I32), tail_im.astype(I32)], axis=-1)
        fr = jnp.take(fr, bitrev, axis=-1)
        fi = jnp.take(fi, bitrev, axis=-1)
        fr, fi, scale = complex_ifft(fr, fi, order)
        return fr, scale

    @real_inverse_fft.def_vmap
    def _real_inverse_fft_vmap(axis_size, in_batched, re, im):
        """Batched rule: (n, B) major layout, per-lane adaptive IFFT scaling."""
        if not in_batched[0]:
            re = jnp.broadcast_to(re, (axis_size,) + re.shape)
        if not in_batched[1]:
            im = jnp.broadcast_to(im, (axis_size,) + im.shape)
        re_t = re.T.astype(I32)      # (n//2+1, B)
        im_t = im.T.astype(I32)
        tail_re = re_t[1:-1][::-1]
        tail_im = spl.to_w16(-im_t[1:-1][::-1])  # int16 wrap, as in primal
        fr = jnp.concatenate([re_t, tail_re], axis=0)
        fi = jnp.concatenate([im_t, tail_im], axis=0)
        fr = fr[bitrev, :]
        fi = fi[bitrev, :]
        fr, fi, scale = _complex_ifft_bmaj(fr, fi, order)
        return (fr.T, scale), (True, True)

    return real_forward_fft, real_inverse_fft


# The AECM hot path: order-7 (128-point) pair.
real_forward_fft, real_inverse_fft = make_real_fft(ORDER)
