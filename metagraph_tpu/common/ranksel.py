"""Blocked rank/select over device tensors.

TPU-native replacement for the reference's succinct bit-vector / wavelet
tree hierarchy (metagraph/src/common/vectors/bit_vector.hpp:12,
wavelet_tree.hpp:13), now in the blocked layout the docstring of round 1
promised:

  * ``BitRank``: bits packed into uint32 words + one int32 exclusive
    rank per word — 0.25 B/position (vs 4 B for the round-1 dense
    prefix). rank = gather + ``lax.population_count``; select = binary
    search over word ranks + a 5-step in-word bisection (pure
    arithmetic, no extra tables).
  * ``SymbolRank``: the sequence itself (int8) + per-128-position
    per-symbol block counts — ~1.3 B/position for sigma=10 (vs 40 B
    round-1). rank = block gather + one (Q, 128) in-block row gather
    with masked compare; select = per-query binary search over block
    counts + in-block cumsum/argmax.

All query methods are batched: they take (Q,) index tensors.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

_BS = 128          # SymbolRank block size (positions)
_BS_LOG = 7


def _pack_bits_device(bits: jax.Array) -> jax.Array:
    """(n,) bool -> (ceil(n/32),) uint32, little-endian within word."""
    n = bits.shape[0]
    nw = max((n + 31) // 32, 1)
    padded = jnp.zeros((nw * 32,), jnp.uint32).at[:n].set(
        bits.astype(jnp.uint32))
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(padded.reshape(nw, 32) << shifts[None, :], axis=1,
                   dtype=jnp.uint32)


def _low_mask(b: jax.Array) -> jax.Array:
    """uint32 mask of bits 0..b inclusive (b in [0, 31])."""
    return jnp.uint32(0xFFFFFFFF) >> (jnp.uint32(31) - b.astype(jnp.uint32))


def _in_word_select(word: jax.Array, r: jax.Array) -> jax.Array:
    """Position (0-based) of the r-th (1-based) set bit of each word."""
    pos = jnp.zeros_like(r)
    w = word
    rr = r
    for width in (16, 8, 4, 2, 1):
        low = w & ((jnp.uint32(1) << width) - jnp.uint32(1))
        cnt = jax.lax.population_count(low).astype(rr.dtype)
        go_high = cnt < rr
        rr = jnp.where(go_high, rr - cnt, rr)
        pos = jnp.where(go_high, pos + width, pos)
        w = jnp.where(go_high, w >> width, low)
    return pos


@dataclass(frozen=True)
class BitRank:
    """Blocked rank/select over a boolean vector."""
    words: jax.Array   # (nw,) uint32
    brank: jax.Array   # (nw,) int32 exclusive rank before each word
    total: jax.Array   # () int32 number of set bits
    n: int

    @staticmethod
    def build(bits: jax.Array) -> "BitRank":
        words = _pack_bits_device(jnp.asarray(bits))
        pops = jax.lax.population_count(words).astype(jnp.int32)
        brank = jnp.cumsum(pops) - pops
        total = brank[-1] + pops[-1] if words.shape[0] else jnp.int32(0)
        return BitRank(words=words, brank=brank, total=total,
                       n=int(jnp.asarray(bits).shape[0]))

    @property
    def num_set(self) -> jax.Array:
        return self.total

    def bit(self, i: jax.Array) -> jax.Array:
        """bits[i] as bool (i clipped into range; i<0 -> False)."""
        ic = jnp.clip(i, 0, max(self.n - 1, 0))
        w = self.words[ic >> 5]
        b = (w >> (ic & 31).astype(jnp.uint32)) & jnp.uint32(1)
        return (b == 1) & (i >= 0) & (i < self.n)

    def rank1(self, i: jax.Array) -> jax.Array:
        """#ones in bits[0..i] (inclusive, like bit_vector::rank1)."""
        i = jnp.clip(i, -1, self.n - 1)
        ic = jnp.maximum(i, 0)
        wi = ic >> 5
        r = self.brank[wi] + jax.lax.population_count(
            self.words[wi] & _low_mask(ic & 31)).astype(jnp.int32)
        return jnp.where(i < 0, 0, r)

    def rank0(self, i: jax.Array) -> jax.Array:
        return i + 1 - self.rank1(i)

    def select1(self, r: jax.Array) -> jax.Array:
        """Position of the r-th one (1-based r), as in bit_vector::select1."""
        r = r.astype(jnp.int32)
        wi = jnp.searchsorted(self.brank, r, side="left").astype(jnp.int32) - 1
        wi = jnp.clip(wi, 0, max(self.words.shape[0] - 1, 0))
        rr = r - self.brank[wi]
        pos = _in_word_select(self.words[wi], rr)
        return (wi << 5) + pos

    def next1(self, i: jax.Array) -> jax.Array:
        """Smallest j >= i with bits[j] set, else n (reference next1)."""
        r = self.rank1(i - 1) + 1
        pos = self.select1(r)
        return jnp.where(r <= self.total, pos, self.n)

    def prev1(self, i: jax.Array) -> jax.Array:
        """Largest j <= i with bits[j] set, else n (reference prev1)."""
        r = self.rank1(i)
        return jnp.where(r > 0, self.select1(r), self.n)

    # -- host helpers ------------------------------------------------------

    def bits_host(self) -> np.ndarray:
        """(n,) bool on host."""
        w = np.asarray(self.words)
        bits = np.unpackbits(w.view(np.uint8), bitorder="little")
        return bits[:self.n].astype(bool)

    def set_positions(self) -> np.ndarray:
        """Sorted positions of set bits (host)."""
        return np.nonzero(self.bits_host())[0]


_WPB = _BS // 4            # uint32 words per block (4 chars per word)
_WPB_LOG = _BS_LOG - 2
# popcount masks for "first m bytes of a word": m -> 0x80 bit per byte
_BYTE_MASKS = np.array([0x00000000, 0x00000080, 0x00008080,
                        0x00808080, 0x80808080], np.uint32)


def _match_bits(words: jax.Array, c: jax.Array) -> jax.Array:
    """0x80 bit per byte of ``words`` equal to symbol ``c`` — SWAR
    zero-byte detect, EXACT for byte values < 128: per-byte x + 0x7F
    stays < 0x100, so no cross-byte carries (the classic
    (x-0x01..)&~x form false-positives on 0x01 bytes above a zero)."""
    x = words ^ (c.astype(jnp.uint32) * jnp.uint32(0x01010101))
    return (~((x + jnp.uint32(0x7F7F7F7F)) | x)) & jnp.uint32(0x80808080)


@dataclass(frozen=True)
class SymbolRank:
    """Per-symbol blocked rank/select over a small-alphabet sequence
    (wavelet-tree replacement for the BOSS W array). The sequence lives
    byte-packed in uint32 words (byte b of word w = char 4w+b): TPU
    gathers of (Q, 32) uint32 block rows run ~10x faster than the
    (Q, 128) int8 rows of the round-1 layout, and the in-block counts
    become SWAR popcounts."""
    seq_words: jax.Array  # (nb * _WPB,) uint32, pad char = sigma
    blocks: jax.Array     # (nb + 1, sigma) int32 exclusive counts per block
    sigma: int
    n_seq: int

    @staticmethod
    def pack_words(seq_pad: jax.Array) -> jax.Array:
        """(nb*_BS,) int8/int32 chars -> (nb*_WPB,) uint32 words."""
        v = seq_pad.astype(jnp.uint32).reshape(-1, 4)
        return (v[:, 0] | (v[:, 1] << 8) | (v[:, 2] << 16)
                | (v[:, 3] << 24))

    @staticmethod
    def build(seq: jax.Array, sigma: int) -> "SymbolRank":
        seq = jnp.asarray(seq)
        n = int(seq.shape[0])
        nb = max((n + _BS - 1) // _BS, 1)
        pad = jnp.full((nb * _BS,), sigma, jnp.int8).at[:n].set(
            seq.astype(jnp.int8))
        hist = []
        for c in range(sigma):
            hist.append(jnp.sum((pad == c).reshape(nb, _BS), axis=1,
                                dtype=jnp.int32))
        hist = jnp.stack(hist, axis=1)                 # (nb, sigma)
        blocks = jnp.concatenate(
            [jnp.zeros((1, sigma), jnp.int32), jnp.cumsum(hist, axis=0)])
        return SymbolRank(seq_words=SymbolRank.pack_words(pad),
                          blocks=blocks, sigma=sigma, n_seq=n)

    @property
    def seq_pad(self) -> jax.Array:
        """(nb*_BS,) int8 unpacked view (compat; build-time/host use)."""
        w = self.seq_words
        parts = jnp.stack([(w >> (8 * b)) & 0xFF for b in range(4)],
                          axis=1)
        return parts.reshape(-1).astype(jnp.int8)

    @property
    def seq(self) -> jax.Array:
        return self.seq_pad[:self.n_seq]

    @property
    def n(self) -> int:
        return self.n_seq

    def _rows(self, blk: jax.Array) -> jax.Array:
        """(Q, _WPB) uint32 block contents — a whole-row 1D gather of the
        (nb, _WPB) view, ~2.7x faster on TPU than a 2D index grid."""
        return self.seq_words.reshape(-1, _WPB)[blk]

    def rank(self, c: jax.Array, i: jax.Array) -> jax.Array:
        """#occurrences of symbol c in seq[0..i] (inclusive)."""
        c, i = jnp.broadcast_arrays(jnp.asarray(c), jnp.asarray(i))
        shape = c.shape
        c = c.reshape(-1).astype(jnp.int32)
        i = i.reshape(-1)
        p = jnp.clip(i + 1, 0, self.n)                 # exclusive position
        blk = (p >> _BS_LOG).astype(jnp.int32)
        base = self.blocks.reshape(-1)[blk * self.sigma + c]
        rem = (p & (_BS - 1)).astype(jnp.int32)
        v = self._rows(blk)
        hz = _match_bits(v, c[:, None])
        # bytes of word j valid iff 4j + b < rem: clamp(rem - 4j, 0, 4)
        vj = jnp.clip(rem[:, None]
                      - 4 * jnp.arange(_WPB, dtype=jnp.int32)[None, :],
                      0, 4)
        masks = jnp.asarray(_BYTE_MASKS)[vj]
        cnt = jnp.sum(jax.lax.population_count(hz & masks),
                      axis=1).astype(jnp.int32)
        return (base + cnt).reshape(shape)

    def select(self, c: jax.Array, r: jax.Array) -> jax.Array:
        """Position of the r-th (1-based) occurrence of c."""
        c, r = jnp.broadcast_arrays(jnp.asarray(c), jnp.asarray(r))
        shape = c.shape
        c = c.reshape(-1).astype(jnp.int32)
        r = r.reshape(-1).astype(jnp.int32)
        nb = self.blocks.shape[0] - 1
        sigma = self.sigma
        bflat = self.blocks.reshape(-1)
        steps = max(1, int(np.ceil(np.log2(nb + 2))))
        lo = jnp.zeros_like(r)              # invariant: blocks[lo, c] < r
        hi = jnp.full_like(r, nb)

        def body(_, state):
            lo, hi = state
            mid = (lo + hi + 1) >> 1
            go_up = bflat[mid * sigma + c] < r
            lo = jnp.where(go_up, mid, lo)
            hi = jnp.where(go_up, hi, mid - 1)
            return lo, hi

        lo, hi = jax.lax.fori_loop(0, steps, body, (lo, hi))
        rr = r - bflat[lo * sigma + c]
        v = self._rows(lo)
        hz = _match_bits(v, c[:, None])
        mcnt = jax.lax.population_count(hz).astype(jnp.int32)  # per word
        cum = jnp.cumsum(mcnt, axis=1)
        j = jnp.argmax(cum >= rr[:, None], axis=1).astype(jnp.int32)
        rr_w = rr - (cum[jnp.arange(cum.shape[0]), j]
                     - mcnt[jnp.arange(cum.shape[0]), j])
        hz_w = hz[jnp.arange(hz.shape[0]), j]
        mb = jnp.stack([(hz_w >> (8 * b + 7)) & 1 for b in range(4)],
                       axis=1).astype(jnp.int32)
        cb = jnp.cumsum(mb, axis=1)
        b = jnp.argmax(cb >= rr_w[:, None], axis=1).astype(jnp.int32)
        pos = (lo << _BS_LOG) + 4 * j + b
        return pos.reshape(shape)

    def __getitem__(self, i):
        i = jnp.asarray(i)
        w = self.seq_words[i >> 2]
        return ((w >> ((i & 3).astype(jnp.uint32) * 8))
                & jnp.uint32(0xFF)).astype(jnp.int32)


def register_pytrees():
    jax.tree_util.register_dataclass(
        BitRank, ["words", "brank", "total"], ["n"])
    jax.tree_util.register_dataclass(
        SymbolRank, ["seq_words", "blocks"], ["sigma", "n_seq"])


register_pytrees()
