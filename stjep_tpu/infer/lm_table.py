"""On-device n-gram LM shallow fusion via a hashed probe table in HBM.

The reference's LM fusion calls a host Python object per candidate per decode
step (ref: models/Dec.py:236-317); the faithful rebuild keeps that as a
jax.pure_callback (infer/lm_fusion.py), which serialises every step on the
host round-trip. This module removes the host sync: the n-gram model's
explicit entries are packed once into flat arrays (an open-addressed hash
table), uploaded to HBM, and each decode step scores its TOP_N candidates
with pure gathers — no callback, no host.

Table layout (numpy -> device):
    h2   [S] uint32   second hash of the stored key (slot occupancy + verify)
    val  [S] float32  log10/e probability of the ngram (same base the host
                      object would return; we store what the builder passes)
    bow  [S] float32  backoff weight of a *context* entry (0.0 if none)

Keys are (token..., ) int tuples; an ngram entry's key is (ctx..., word),
a backoff entry's key is (ctx...,). Two independent 32-bit multiplicative
hashes give an effective 64-bit identity check; the builder verifies that
stored keys do not collide and that linear probing terminates within
MAX_PROBES for every stored key.

Scoring semantics:
- backoff=True: standard ARPA/Katz recursion
      score(w | c) = logp(c+w)                      if c+w stored
                   = bow(c) + score(w | c[1:])      otherwise
  with bow() = 0 for absent contexts and a floor of MISS_SCORE when no
  level matches (mirrors the reference's -inf -> -1e10 clamp, Dec.py:293-295).
- backoff=False (strict): probe only the exact-order ngram; a miss scores
  MISS_SCORE. This reproduces e.g. NLTK MLE models exported order-by-order,
  where an unseen full-order ngram is -inf, exactly matching the callback
  path's clamping.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from stjep_tpu.config import BOS

TOP_N = 10  # ref: Dec.py:287
MISS_SCORE = -1e10  # ref: Dec.py:293-295 (-inf clamp)
MAX_PROBES = 16
_EMPTY = np.uint32(0)

_MULT1 = np.uint32(0x9E3779B1)
_MULT2 = np.uint32(0x85EBCA77)
_SEED1 = np.uint32(0x811C9DC5)
_SEED2 = np.uint32(0xC2B2AE3D)


def _hash_np(tokens: np.ndarray, mult: np.uint32, seed: np.uint32) -> np.ndarray:
    """Vector hash of [..., K] int token arrays -> [...] uint32 (host)."""
    h = np.full(tokens.shape[:-1], seed, np.uint32)
    for k in range(tokens.shape[-1]):
        t = tokens[..., k].astype(np.uint32)
        h = (h ^ (t + np.uint32(1))) * mult
        h = h ^ (h >> np.uint32(15))
    return h


def _hash_jnp(tokens, mult: int, seed: int):
    """Same hash, traced (tokens [..., K] int32). Must match _hash_np
    bit-for-bit; uint32 wraparound is native in both."""
    h = jnp.full(tokens.shape[:-1], np.uint32(seed), jnp.uint32)
    m = jnp.uint32(mult)
    for k in range(tokens.shape[-1]):
        t = tokens[..., k].astype(jnp.uint32)
        h = (h ^ (t + jnp.uint32(1))) * m
        h = h ^ (h >> 15)
    return h


def _hash_tuple(key: Tuple[int, ...], mult, seed) -> Tuple[np.uint32, np.uint32]:
    arr = np.asarray(key, np.int64).reshape(1, -1)
    return _hash_np(arr, mult, seed)[0]


class NGramTable:
    """Host-built, device-queried hashed n-gram table."""

    def __init__(self, h2, val, bow, size: int, order: int, backoff: bool):
        self.h2 = h2  # jnp uint32 [S]; 0 = empty slot
        self.val = val  # jnp float32 [S]
        self.bow = bow  # jnp float32 [S]
        self.size = size
        self.order = order
        self.backoff = backoff
        self.on_device = True

    @classmethod
    def from_ngrams(
        cls,
        entries: Dict[Tuple[int, ...], float],
        backoffs: Optional[Dict[Tuple[int, ...], float]] = None,
        order: int = 4,
    ) -> "NGramTable":
        """Pack explicit ngram logprobs (+ optional context backoff weights)
        into the flat table. Keys are int tuples (ctx..., word) for entries
        and (ctx...,) for backoffs; a tuple may appear in both (its slot then
        carries both val and bow, as in ARPA files)."""
        backoffs = backoffs or {}
        keys = sorted(set(entries) | set(backoffs))
        n = len(keys)
        size = 8
        while size < 4 * max(n, 1):
            size *= 2

        for attempt in range(3):
            h2a = np.zeros(size, np.uint32)
            vala = np.full(size, MISS_SCORE, np.float32)
            bowa = np.zeros(size, np.float32)
            used = np.zeros(size, bool)
            keyat: Dict[int, Tuple[int, ...]] = {}
            ok = True
            for key in keys:
                hh1 = int(_hash_tuple(key, _MULT1, _SEED1))
                hh2 = int(_hash_tuple(key, _MULT2, _SEED2))
                if hh2 == int(_EMPTY):
                    hh2 = 1  # 0 marks empty slots
                placed = False
                for p in range(MAX_PROBES):
                    s = (hh1 + p) % size
                    if not used[s]:
                        used[s] = True
                        h2a[s] = hh2
                        keyat[s] = key
                        placed = True
                        break
                    if h2a[s] == hh2:
                        # same 64-bit identity from a different key = a real
                        # collision the device probe could not distinguish
                        if keyat[s] != key:
                            raise ValueError(
                                f"ngram hash collision: {keyat[s]} vs {key}"
                            )
                        placed = True
                        break
                if not placed:
                    ok = False
                    break
                if key in entries:
                    vala[s] = np.float32(entries[key])
                if key in backoffs:
                    bowa[s] = np.float32(backoffs[key])
            if ok:
                break
            size *= 2  # probe chain overflow: grow and retry
        else:
            raise ValueError("could not place all ngrams within MAX_PROBES")

        return cls(
            jnp.asarray(h2a), jnp.asarray(vala), jnp.asarray(bowa),
            size=size, order=order, backoff=backoffs is not None and len(backoffs) > 0,
        )

    # ------------------------------------------------------------- queries

    def _probe(self, tokens):
        """tokens [..., K] int32 -> (found [...], val [...], bow [...])."""
        hh1 = _hash_jnp(tokens, int(_MULT1), int(_SEED1))
        hh2 = _hash_jnp(tokens, int(_MULT2), int(_SEED2))
        hh2 = jnp.where(hh2 == 0, jnp.uint32(1), hh2)
        found = jnp.zeros(hh1.shape, bool)
        val = jnp.full(hh1.shape, MISS_SCORE, jnp.float32)
        bow = jnp.zeros(hh1.shape, jnp.float32)
        done = jnp.zeros(hh1.shape, bool)
        for p in range(MAX_PROBES):
            s = (hh1 + jnp.uint32(p)) & jnp.uint32(self.size - 1)
            slot_h2 = self.h2[s]
            hit = (~done) & (slot_h2 == hh2)
            empty = (~done) & (slot_h2 == 0)
            val = jnp.where(hit, self.val[s], val)
            bow = jnp.where(hit, self.bow[s], bow)
            found = found | hit
            done = done | hit | empty
        return found, val, bow

    def score(self, ctx_tokens, n_ctx, word):
        """logscore(word | last-n_ctx tokens of ctx_tokens).

        ctx_tokens [..., C] int32 (C = order-1 slots, oldest first),
        n_ctx [] or [...] traced int in [0, C], word [...] int32.
        Returns [...] float32.
        """
        C = ctx_tokens.shape[-1]
        n_ctx = jnp.asarray(n_ctx)
        word = word.astype(jnp.int32)

        # For each possible context length k (0..C): probe ngram (suffix_k +
        # word) and context backoff (suffix_k). Static unrolled loop, traced
        # select by n_ctx.
        founds, vals, bows = [], [], []
        for k in range(C + 1):
            if k == 0:
                toks = word[..., None]
            else:
                toks = jnp.concatenate(
                    [ctx_tokens[..., C - k:], word[..., None]], axis=-1
                ).astype(jnp.int32)
            f, v, _ = self._probe(toks)
            if k == 0:
                b = jnp.zeros(f.shape, jnp.float32)
            else:
                _, _, b = self._probe(ctx_tokens[..., C - k:].astype(jnp.int32))
            founds.append(f)
            vals.append(v)
            bows.append(b)

        if not self.backoff:
            # strict: only the exact-order probe counts
            out = jnp.full(word.shape, MISS_SCORE, jnp.float32)
            for k in range(C + 1):
                out = jnp.where((n_ctx == k) & founds[k], vals[k], out)
            return out

        # ARPA backoff: highest found order wins; accumulate bow of every
        # higher (missed) order along the way.
        out = jnp.full(word.shape, MISS_SCORE, jnp.float32)
        for n in range(C + 1):  # actual context length
            score = jnp.full(word.shape, MISS_SCORE, jnp.float32)
            acc = jnp.zeros(word.shape, jnp.float32)
            settled = jnp.zeros(word.shape, bool)
            for k in range(n, -1, -1):
                take = (~settled) & founds[k]
                score = jnp.where(take, acc + vals[k], score)
                settled = settled | take
                acc = acc + jnp.where(settled, 0.0, bows[k])
            out = jnp.where(n_ctx == n, score, out)
        return out


def make_table_fuser(table: NGramTable, lm_mode: str):
    """On-device equivalent of infer/lm_fusion.make_ngram_fuser: returns a
    traced (logp [B,V], ctx [B,3], step) -> [B,V] function with
    fn.on_device = True, or None for 'null'."""
    if lm_mode == "null" or table is None:
        return None
    mode = lm_mode.split("_")[0]
    alpha = float(lm_mode.split("_")[-1])
    if mode != "s-4g":
        raise NotImplementedError(f"lm_mode {lm_mode} not implemented")

    def fuse(logp, ctx, step):
        B, V = logp.shape
        top_v, top_i = jax.lax.top_k(logp, TOP_N)  # [B, N]
        # context: last min(3, step) emitted ids, or [BOS] at step 0 (the
        # reference's context build, ref: Dec.py:283-285 / infer/lm_fusion.py);
        # step 0 = length-1 context with BOS in the newest slot
        ctx_eff = jnp.where(step == 0, ctx.at[:, 2].set(BOS), ctx)
        n_eff = jnp.where(step == 0, 1, jnp.minimum(step, 3))
        raw = table.score(
            ctx_eff[:, None, :].repeat(TOP_N, axis=1), n_eff,
            top_i.astype(jnp.int32),
        )  # [B, N]
        lsm = jax.nn.log_softmax(raw, axis=-1)
        comb = jnp.log(jnp.exp(top_v) + alpha * jnp.exp(lsm)).astype(logp.dtype)
        return logp.at[jnp.arange(B)[:, None], top_i].set(comb)

    fuse.on_device = True
    return fuse
