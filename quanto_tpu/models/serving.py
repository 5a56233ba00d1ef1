"""Continuous-batching serving engine.

Not present in the torch reference (single-request, eager generation only) —
part of the TPU build's production-serving story. Slot-based continuous
batching with static shapes (jit-friendly):

- a fixed pool of `max_batch` sequence slots sharing one KV cache
  [max_batch, max_len, H, D] (float or int8/fp8-quantized);
- prefill runs per request (batch-1 program) and its cache rows are
  scattered into the pooled cache at the assigned slot;
- decode steps ALL active slots in one batched program with per-slot
  positions (`cache_pos` as a [B] vector — the attention mask handles the
  ragged sequence lengths);
- finished slots are released and immediately reusable, so throughput does
  not stall on the longest sequence in a batch.

Greedy sampling; plug a different `sample_fn` for temperature/top-k.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx


__all__ = ["BatchedEngine", "DistributedEngine", "PagedEngine"]


@dataclasses.dataclass
class _Request:
    rid: int
    slot: int
    prompt_len: int
    max_new_tokens: int
    tokens: List[int]
    done: bool = False
    # Original prompt ids — kept by engines that may need to recompute the
    # sequence (PagedEngine preemption) and by enqueue()'d requests whose
    # prefill is still pending; None otherwise.
    prompt: Optional[np.ndarray] = None


@dataclasses.dataclass
class _PrefillState:
    """An admitted request whose prompt is prefilled chunk-by-chunk,
    interleaved with decode (mixed steps)."""

    req: _Request
    next_chunk: int = 0


class BatchedEngine:
    """Slot-based continuous batching.

    `mesh`: optional `jax.sharding.Mesh` for tensor-parallel serving — the
    MODEL must already be sharded (`parallel.shard_model`); the engine then
    shards the pooled KV cache over the mesh's "tp" axis (kv heads) and runs
    every jitted program inside the mesh context, which is the north-star
    serving topology (sharded quantized weights + sharded quantized cache +
    continuous batching; XLA inserts the ICI collectives).
    """

    def __init__(
        self,
        model,
        max_batch: int = 8,
        max_len: int = 512,
        kv_quant=None,
        eos_token_id: Optional[int] = None,
        sample_fn: Optional[Callable] = None,
        mesh=None,
        prefill_chunk: Optional[int] = None,
    ):
        self.model = model
        import inspect

        # Ring-cache models (GPT-OSS sliding windows) take a `write_len`
        # kwarg masking pad/garbage chunk columns out of their ring writes
        # (flat caches absorb garbage at future positions; rings alias it
        # onto live window slots). Detected once; chunk programs pass it
        # only when supported.
        sig = inspect.signature(type(model).__call__).parameters
        self._accepts_write_len = "write_len" in sig
        # `logits_indices`: slice hidden states at each row's last real
        # token BEFORE the lm_head — prefill skips O(T*vocab) logits memory
        # and (T-1)/T of the head matmul (decisive at 128k-201k vocabs).
        self._accepts_logits_idx = "logits_indices" in sig
        self.max_batch = max_batch
        self.max_len = max_len
        self.eos_token_id = eos_token_id
        self._mesh = mesh
        # Sequence-parallel serving: a mesh with an "sp" axis (size > 1)
        # shards the pooled KV cache along the SEQUENCE dim and routes model
        # attention through `cp_cached_attention` (distributed online
        # softmax) — a sequence whose cache outgrows one chip's HBM serves
        # across chips. Composes with "tp" (kv heads).
        self._sp_axis = (
            "sp"
            if mesh is not None and "sp" in mesh.axis_names and mesh.shape["sp"] > 1
            else None
        )
        if self._sp_axis is not None and max_len % mesh.shape["sp"] != 0:
            # cp_cached_attention shards the cache sequence dim evenly; an
            # indivisible max_len would otherwise surface as an obscure
            # shard_map error at the first add().
            raise ValueError(
                f"max_len ({max_len}) must be divisible by the 'sp' axis "
                f"size ({mesh.shape['sp']}) for sequence-parallel serving"
            )
        # Chunked prefill: pad prompts to fixed `prefill_chunk`-token pieces
        # so ONE compiled prefill program serves every prompt length (the
        # default compiles one program per distinct length). Padding garbage
        # past the prompt end is never read: decode step q overwrites
        # position q before attending, and the causal mask hides the rest.
        self.prefill_chunk = prefill_chunk
        self._graphdef, self._state = nnx.split(model)
        self._cache = self._make_cache(kv_quant)
        if mesh is not None:
            self._cache = self._shard_cache(self._cache, mesh)
        self._pos = np.zeros((max_batch,), np.int32)  # next write position per slot
        self._last_tok = np.zeros((max_batch,), np.int32)
        self._free = list(range(max_batch))
        self._requests: Dict[int, _Request] = {}
        self._by_slot: Dict[int, _Request] = {}
        self._prefill_by_slot: Dict[int, _PrefillState] = {}
        self._queue: List[_Request] = []  # enqueue()'d, awaiting a free slot
        self._next_rid = 0
        from .sampling import greedy

        self._sample = sample_fn or greedy
        self._key = jax.random.PRNGKey(0)

        sample = self._sample

        @jax.jit
        def _sample_only(logits, key):
            # Sampling as a device program (not a host-eager op): on a
            # multi-process mesh, eager ops on non-fully-addressable logits
            # are illegal — DistributedEngine routes through this.
            return sample(logits, key).astype(jnp.int32)

        self._sample_only_fn = _sample_only

        graphdef = self._graphdef
        wl_ok = self._accepts_write_len
        li_ok = self._accepts_logits_idx

        @jax.jit
        def _prefill(state, ids, slot_cache):
            m = nnx.merge(graphdef, state)
            if li_ok:
                logits, slot_cache = m(
                    ids, slot_cache, 0, logits_indices=ids.shape[1] - 1
                )
                return logits[:, 0], slot_cache
            logits, slot_cache = m(ids, slot_cache, 0)
            return logits[:, -1], slot_cache

        @jax.jit
        def _prefill_at(state, ids, slot_cache, pos):
            # Prefill starting at cache offset `pos` (prefix-sharing path:
            # positions < pos are already present in the cache and the
            # model's mask lets queries attend to them).
            m = nnx.merge(graphdef, state)
            if li_ok:
                logits, slot_cache = m(
                    ids, slot_cache, pos, logits_indices=ids.shape[1] - 1
                )
                return logits[:, 0], slot_cache
            logits, slot_cache = m(ids, slot_cache, pos)
            return logits[:, -1], slot_cache

        @jax.jit
        def _prefill_chunk_fn(state, ids, slot_cache, pos, last_idx, wlen):
            # Fixed-shape prefill piece at cache offset `pos`; `last_idx`
            # selects the last REAL token's logits inside the padded chunk;
            # `wlen` [1] is the real token count (ring-write masking).
            m = nnx.merge(graphdef, state)
            kw = {"write_len": wlen} if wl_ok else {}
            if li_ok:
                logits, slot_cache = m(
                    ids, slot_cache, pos, logits_indices=last_idx, **kw
                )
                return logits[:, 0], slot_cache
            logits, slot_cache = m(ids, slot_cache, pos, **kw)
            last = jax.lax.dynamic_slice_in_dim(logits, last_idx, 1, axis=1)
            return last[:, 0], slot_cache

        @jax.jit
        def _scatter_slot(cache, slot_cache, slot):
            def put(big, small):
                return jax.lax.dynamic_update_slice(
                    big, small.astype(big.dtype), (slot,) + (0,) * (big.ndim - 1)
                )

            return jax.tree_util.tree_map(put, cache, slot_cache)

        @jax.jit
        def _step(state, toks, cache, pos, key):
            m = nnx.merge(graphdef, state)
            logits, cache = m(toks, cache, pos)
            nxt = self._sample(logits[:, -1], key)
            return nxt.astype(jnp.int32), cache

        @jax.jit
        def _prefill_batch_chunk(state, ids, cache, pos, last_idx, wlen):
            # One fixed-size prefill chunk for EVERY slot through the pooled
            # cache: ids [B, C], per-slot absolute positions `pos` [B] (the
            # same per-slot-position machinery decode uses, just T=C).
            # `last_idx` [B] selects each row's last REAL token inside the
            # chunk (clamped for rows whose last token is elsewhere — the
            # host keeps a row's logits only for the chunk that contains
            # it). `wlen` [B]: per-row real token count (0 = row not
            # participating — ring layers skip its writes entirely).
            m = nnx.merge(graphdef, state)
            kw = {"write_len": wlen} if wl_ok else {}
            idx = jnp.clip(last_idx, 0, ids.shape[1] - 1)
            if li_ok:
                logits, cache = m(ids, cache, pos, logits_indices=idx, **kw)
                return logits[:, 0], cache
            logits, cache = m(ids, cache, pos, **kw)
            last = jnp.take_along_axis(logits, idx[:, None, None], axis=1)[:, 0]
            return last, cache

        @jax.jit
        def _mixed_chunk(state, ids, cache, pos, last_idx, key, wlen):
            # One MIXED step: prefilling rows carry their next prompt chunk,
            # decoding rows carry [last_tok, 0, ...] (their real token at
            # column 0, garbage after — the same [B, C] program either way,
            # so decode tokens ride the prefill chunk at no extra program
            # cost). `last_idx` selects each row's logits column (the last
            # real prompt token for a finishing prefill row, 0 for a decode
            # row); sampling happens in-program so the host fetches ONE [B]
            # token vector per chunk.
            m = nnx.merge(graphdef, state)
            kw = {"write_len": wlen} if wl_ok else {}
            idx = jnp.clip(last_idx, 0, ids.shape[1] - 1)
            if li_ok:
                logits, cache = m(ids, cache, pos, logits_indices=idx, **kw)
                last = logits[:, 0]
            else:
                logits, cache = m(ids, cache, pos, **kw)
                last = jnp.take_along_axis(logits, idx[:, None, None], axis=1)[:, 0]
            nxt = self._sample(last, key).astype(jnp.int32)
            return nxt, cache

        @functools.partial(jax.jit, static_argnames=("n",))
        def _burst(state, toks, cache, pos, key, n):
            # n decode steps for every slot in ONE device call (lax.scan):
            # amortizes the host round-trip that dominates per-step decode on
            # remote/tunneled devices. The key-split sequence matches step()'s
            # host-side splits exactly, so burst tokens == n step() calls for
            # any sampler.
            m = nnx.merge(graphdef, state)

            def body(carry, _):
                tok, pos, cache, key = carry
                key, sub = jax.random.split(key)
                logits, cache = m(tok, cache, pos)
                nxt = self._sample(logits[:, -1], sub).astype(jnp.int32)[:, None]
                return (nxt, pos + 1, cache, key), nxt[:, 0]

            (_, _, cache, key), toks_out = jax.lax.scan(
                body, (toks, pos, cache, key), None, length=n
            )
            return jnp.transpose(toks_out), cache, key  # [B, n]

        self._prefill_fn = _prefill
        self._prefill_at_fn = _prefill_at
        self._prefill_chunk_fn = _prefill_chunk_fn
        self._scatter_fn = _scatter_slot
        self._step_fn = _step
        self._burst_fn = _burst
        self._prefill_batch_chunk_fn = _prefill_batch_chunk
        self._mixed_fn = _mixed_chunk
        self._slot_cache_template = None

    def _prefill_into(self, slot_cache, prompt, start_pos: int = 0):
        """Prefill `prompt` into `slot_cache` starting at `start_pos`;
        returns (last-real-token logits, cache). Uses fixed-shape chunks when
        `prefill_chunk` is set (one compiled program for all lengths), the
        whole-prompt program otherwise."""
        C = self.prefill_chunk
        if C is None:
            ids = jnp.asarray(prompt[None, :])
            if start_pos:
                return self._run(
                    self._prefill_at_fn, self._state, ids, slot_cache, jnp.int32(start_pos)
                )
            return self._run(self._prefill_fn, self._state, ids, slot_cache)
        last = None
        n = len(prompt)
        c0 = 0
        while c0 < n:
            chunk = prompt[c0 : c0 + C]
            r = len(chunk)
            if r < C and start_pos + c0 + C > self.max_len:
                # Padding would spill past the cache (dynamic_update_slice
                # clamps backwards and would corrupt real entries): run the
                # remainder through the variable-shape program instead.
                return self._run(
                    self._prefill_at_fn, self._state, jnp.asarray(chunk[None, :]),
                    slot_cache, jnp.int32(start_pos + c0),
                )
            if r < C:
                chunk = np.pad(chunk, (0, C - r))
            last, slot_cache = self._run(
                self._prefill_chunk_fn, self._state, jnp.asarray(chunk[None, :]),
                slot_cache, jnp.int32(start_pos + c0), jnp.int32(r - 1),
                jnp.asarray([r], jnp.int32),
            )
            c0 += C
        return last, slot_cache

    def _build_cache(self, batch: int, kv_quant):
        """Cache of `batch` slots through the model's own init_kv_cache (the
        family-specific layout — GPT-OSS, DeepSeek MLA, ...) or the llama
        default, with the kv_quant SPEC flowing through either way (round-5
        fix: family caches silently dropped it)."""
        from .llama import init_kv_cache

        if hasattr(self.model, "init_kv_cache"):
            if kv_quant is not None:
                return self.model.init_kv_cache(batch, self.max_len, kv_quant=kv_quant)
            return self.model.init_kv_cache(batch, self.max_len)
        return init_kv_cache(self.model.config, batch, self.max_len, kv_quant=kv_quant)

    def _pool_kv_quant(self):
        """The live pool's KV spec name (None for a float cache) — what slot
        caches must be built with so scatter/gather pytrees line up."""
        from ..tensor.kv_cache import QKVCacheLayer

        if isinstance(self._cache[0], QKVCacheLayer):
            # qtype_name is a KV SPEC ("qint4", "k8v4", "qint4a", ...);
            # init_kv_cache/parse_kv_spec accept it verbatim.
            return self._cache[0].qtype_name
        return None

    def _make_cache(self, kv_quant):
        return self._build_cache(self.max_batch, kv_quant)

    def _shard_cache(self, cache, mesh):
        """Pooled dense cache [B, S, H, D]: shard kv heads over "tp" and the
        sequence dim over "sp" (when those axes exist with size > 1); batch
        stays replicated (slots are scattered/gathered by the host loop).
        Per-slot scale tensors [B, S, H, 1] shard congruently."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        tp = "tp" if "tp" in mesh.axis_names and mesh.shape["tp"] > 1 else None
        sp = self._sp_axis

        def put(a):
            if a.ndim != 4:
                return jax.device_put(a, NamedSharding(mesh, P()))
            spec = P(
                None,
                sp if sp and a.shape[1] % mesh.shape[sp] == 0 else None,
                tp if tp and a.shape[2] > 1 and a.shape[2] % mesh.shape[tp] == 0 else None,
                None,
            )
            return jax.device_put(a, NamedSharding(mesh, spec))

        return jax.tree_util.tree_map(put, cache)

    def _run(self, fn, *args, **kwargs):
        if self._mesh is None:
            return fn(*args, **kwargs)
        with self._mesh:
            if self._sp_axis is not None:
                from ..parallel.context import sp_serving

                with sp_serving(self._mesh, self._sp_axis):
                    return fn(*args, **kwargs)
            return fn(*args, **kwargs)

    def _fetch(self, x) -> np.ndarray:
        """Bring a device result to the host. DistributedEngine overrides
        with the multi-process-safe version."""
        return np.asarray(jax.device_get(x))

    def _sample_host(self, logits, key) -> np.ndarray:
        """Sample on device, fetch tokens to host ([B] int32)."""
        return self._fetch(self._run(self._sample_only_fn, logits, key))

    # --- request lifecycle ----------------------------------------------------

    def can_add(self) -> bool:
        return len(self._free) > 0

    def add(self, prompt_ids, max_new_tokens: int = 64) -> int:
        """Prefill a prompt into a free slot; returns the request id."""
        if not self._free:
            raise RuntimeError("no free slots (call step() until one finishes)")
        prompt = np.asarray(prompt_ids, np.int32).reshape(-1)
        if len(prompt) + max_new_tokens > self.max_len:
            raise ValueError("prompt + max_new_tokens exceeds engine max_len")
        slot = self._free.pop()
        slot_cache = self._build_cache(1, self._pool_kv_quant())
        last_logits, slot_cache = self._prefill_into(slot_cache, prompt)
        self._key, sub = jax.random.split(self._key)
        first_tok = int(self._sample_host(last_logits, sub)[0])
        self._cache = self._run(self._scatter_fn, self._cache, slot_cache, slot)
        self._pos[slot] = len(prompt)
        self._last_tok[slot] = first_tok
        rid = self._next_rid
        self._next_rid += 1
        req = _Request(rid, slot, len(prompt), max_new_tokens, [first_tok])
        self._requests[rid] = req
        self._by_slot[slot] = req
        self._maybe_finish(req, first_tok)
        return rid

    def add_batch(self, prompts, max_new_tokens=64) -> List[int]:
        """Admit several requests at once, prefilling them TOGETHER.

        Each fixed-size chunk runs as ONE pooled-cache program over all
        slots (`_prefill_batch_chunk`), so k prompts cost
        ceil(max_len(prompt)/chunk) device calls instead of
        sum(ceil(len_i/chunk)) — the prefill analogue of burst decode.
        Requires `prefill_chunk`; prompts whose padded length would spill
        past max_len (and any overflow beyond the free slots) fall back to
        serial `add()`. Rows of slots NOT being prefilled (mid-generation or
        free) run with their current position: their chunk writes land at
        positions >= their next decode position, which decode overwrites
        before attending (the same garbage-safety argument as chunk
        padding). `max_new_tokens`: scalar or per-prompt list.
        """
        C = self.prefill_chunk
        budgets = (
            list(max_new_tokens)
            if isinstance(max_new_tokens, (list, tuple))
            else [max_new_tokens] * len(prompts)
        )
        if len(budgets) != len(prompts):
            raise ValueError("max_new_tokens list must match prompts")
        if C is None:
            return [self.add(p, m) for p, m in zip(prompts, budgets)]
        # An active slot whose next position exceeds max_len - C cannot take
        # this call's garbage chunk write (the clamped write would land on
        # its REAL earlier entries) — serial-prefill everything instead.
        if any(int(self._pos[s]) > self.max_len - C for s in self._by_slot):
            return [self.add(p, m) for p, m in zip(prompts, budgets)]

        candidates = []
        for p, m in zip(prompts, budgets):
            p = np.asarray(p, np.int32).reshape(-1)
            if len(p) + m > self.max_len:
                raise ValueError("prompt + max_new_tokens exceeds engine max_len")
            candidates.append((p, m, -(-len(p) // C)))

        # Participation gates: (a) the padded prompt fits the cache; (b) a
        # row that finishes before the batch's last chunk needs room for its
        # remaining garbage chunks at [len(p), len(p)+C) — i.e.
        # len(p) <= max_len - C — otherwise the clamped write would land on
        # its own real prefix. Demoting a row can lower max_chunks, which can
        # re-qualify others, so iterate to a fixed point.
        batched, serial = [], []
        for p, m, nc in candidates:
            if nc * C <= self.max_len and len(batched) < len(self._free):
                batched.append((p, m, nc))
            else:
                serial.append((p, m))
        while True:
            if not batched:
                break
            max_chunks = max(nc for _, _, nc in batched)
            bad = [
                (p, m, nc) for p, m, nc in batched
                if nc < max_chunks and len(p) > self.max_len - C
            ]
            if not bad:
                break
            bad_ids = {id(p) for p, _, _ in bad}
            serial += [(p, m) for p, m, _ in bad]
            batched = [t for t in batched if id(t[0]) not in bad_ids]
        batched = [(p, m) for p, m, _ in batched]

        rids_batched: List[int] = []
        if batched:
            slots = [self._free.pop() for _ in batched]
            max_chunks = max(-(-len(p) // C) for p, _ in batched)
            B = self.max_batch
            ids = np.zeros((B, max_chunks * C), np.int32)
            for (p, _), slot in zip(batched, slots):
                ids[slot, : len(p)] = p
            last_logits = [None] * len(batched)
            by_slot_row = {slot: i for i, slot in enumerate(slots)}
            pending = []  # (device last-logits [B,V], slots it is final for)
            for j in range(max_chunks):
                pos = np.array(
                    [min(int(self._pos[s]), self.max_len - C) for s in range(B)],
                    np.int32,
                )
                last_idx = np.full((B,), -1, np.int32)
                wlen = np.zeros((B,), np.int32)
                for (p, _), slot in zip(batched, slots):
                    if j * C < len(p):  # this row still has real tokens
                        pos[slot] = j * C
                        wlen[slot] = min(C, len(p) - j * C)
                        li = len(p) - 1 - j * C
                        if 0 <= li < C:
                            last_idx[slot] = li
                    else:
                        # Row finished its prompt in an earlier chunk: park
                        # its garbage writes just past the prompt (decode
                        # overwrites position q before attending). The
                        # participation gate guarantees len(p) <= max_len - C
                        # for such rows.
                        pos[slot] = len(p)
                chunk = ids[:, j * C : (j + 1) * C]
                last, self._cache = self._run(
                    self._prefill_batch_chunk_fn, self._state,
                    jnp.asarray(chunk), self._cache, jnp.asarray(pos),
                    jnp.asarray(last_idx), jnp.asarray(wlen),
                )
                keep = [s for s in slots if last_idx[s] >= 0]
                if keep:
                    # Defer the host fetch: a device_get here would add a
                    # blocking round-trip per chunk.
                    pending.append((last, keep))
            for last, keep in pending:
                last_host = self._fetch(last)
                for s in keep:
                    last_logits[by_slot_row[s]] = last_host[s]
            for i, ((p, m), slot) in enumerate(zip(batched, slots)):
                self._key, sub = jax.random.split(self._key)
                first_tok = int(
                    self._sample_host(jnp.asarray(last_logits[i][None, :]), sub)[0]
                )
                self._pos[slot] = len(p)
                self._last_tok[slot] = first_tok
                rid = self._next_rid
                self._next_rid += 1
                req = _Request(rid, slot, len(p), m, [first_tok])
                self._requests[rid] = req
                self._by_slot[slot] = req
                self._maybe_finish(req, first_tok)
                rids_batched.append(rid)

        rids_serial = [self.add(p, m) for p, m in serial]
        return rids_batched + rids_serial

    # --- mixed prefill/decode scheduling (chunked-prefill interleaving) -------

    def enqueue(self, prompt_ids, max_new_tokens: int = 64) -> int:
        """Admit a request WITHOUT prefilling it: its prompt is consumed in
        fixed-size chunks by `serve_step()`, each chunk sharing one device
        program with the active slots' decode step — so a new arrival never
        stalls the decode streams (the long-context e2e fix: `add()` drains
        the whole prompt before any active slot decodes again).

        Requires `prefill_chunk`; prompts whose padded length would spill
        past `max_len` prefill blockingly when their slot frees instead of
        in chunks. Returns the request id immediately even when no slot is
        free (the request waits in an admission queue)."""
        C = self.prefill_chunk
        prompt = np.asarray(prompt_ids, np.int32).reshape(-1)
        if len(prompt) + max_new_tokens > self.max_len:
            raise ValueError("prompt + max_new_tokens exceeds engine max_len")
        if (C is None or -(-len(prompt) // C) * C > self.max_len) and self._free:
            return self.add(prompt, max_new_tokens)
        rid = self._next_rid
        self._next_rid += 1
        req = _Request(rid, -1, len(prompt), max_new_tokens, [], prompt=prompt)
        self._requests[rid] = req
        self._queue.append(req)
        self._admit_queued()
        return rid

    def _admit_queued(self) -> None:
        C = self.prefill_chunk
        while self._queue and self._free:
            req = self._queue.pop(0)
            if C is None or -(-req.prompt_len // C) * C > self.max_len:
                # Off the chunk-participation envelope: blocking prefill at
                # admission time (the enqueue() contract still holds — the
                # request waited in the queue until this slot freed).
                inner_rid = self.add(req.prompt, req.max_new_tokens)
                admitted = self._requests.pop(inner_rid)
                req.slot = admitted.slot
                req.tokens = admitted.tokens
                req.done = admitted.done
                self._requests[req.rid] = req
                if not req.done:
                    self._by_slot[req.slot] = req
                continue
            slot = self._free.pop()
            req.slot = slot
            self._pos[slot] = 0
            self._last_tok[slot] = 0
            self._prefill_by_slot[slot] = _PrefillState(req)

    def _mixed_ok(self) -> bool:
        """Mixed steps write a garbage chunk at every row's parked position;
        a DECODING row too close to the cache end cannot absorb that
        (dynamic_update_slice would clamp onto its real entries). Prefilling
        rows are safe by the enqueue() participation gate."""
        C = self.prefill_chunk
        return all(int(self._pos[s]) <= self.max_len - C for s in self._by_slot)

    def _mixed_chunk_step(self) -> Dict[int, int]:
        """ONE mixed step: every prefilling row advances one prompt chunk,
        every decoding row emits one token — a single [B, C] device program
        plus a single [B] token fetch. Returns {rid: token} for rows that
        produced a token (decode rows + prefill rows that just finished)."""
        C = self.prefill_chunk
        B = self.max_batch
        ids = np.zeros((B, C), np.int32)
        pos = np.array(
            [min(int(self._pos[s]), self.max_len - C) for s in range(B)], np.int32
        )
        last_idx = np.zeros((B,), np.int32)
        wlen = np.zeros((B,), np.int32)
        finals = set()
        for slot, st in self._prefill_by_slot.items():
            p = st.req.prompt
            c0 = st.next_chunk * C
            chunk = p[c0 : c0 + C]
            ids[slot, : len(chunk)] = chunk
            pos[slot] = c0
            wlen[slot] = len(chunk)
            if c0 + len(chunk) >= len(p):
                last_idx[slot] = len(chunk) - 1
                finals.add(slot)
            st.next_chunk += 1
        for slot, req in self._by_slot.items():
            ids[slot, 0] = self._last_tok[slot]
            pos[slot] = self._pos[slot]
            wlen[slot] = 1
        self._key, sub = jax.random.split(self._key)
        nxt, self._cache = self._run(
            self._mixed_fn, self._state, jnp.asarray(ids), self._cache,
            jnp.asarray(pos), jnp.asarray(last_idx), sub, jnp.asarray(wlen),
        )
        nxt = self._fetch(nxt)
        out: Dict[int, int] = {}
        for slot, req in list(self._by_slot.items()):
            tok = int(nxt[slot])
            req.tokens.append(tok)
            out[req.rid] = tok
            self._pos[slot] += 1
            self._last_tok[slot] = tok
            self._maybe_finish(req, tok)
        for slot, st in list(self._prefill_by_slot.items()):
            req = st.req
            if slot in finals:
                del self._prefill_by_slot[slot]
                tok = int(nxt[slot])
                self._pos[slot] = req.prompt_len
                self._last_tok[slot] = tok
                req.tokens.append(tok)
                out[req.rid] = tok
                self._by_slot[slot] = req
                self._maybe_finish(req, tok)
            else:
                self._pos[slot] = st.next_chunk * C
        return out

    def serve_step(self, burst: Optional[int] = None):
        """One scheduling quantum: admit queued requests, then either a mixed
        prefill+decode chunk (when prefill work is pending) or a decode
        quantum (a power-of-two burst, or a single step)."""
        self._admit_queued()
        if self._prefill_by_slot:
            if self._mixed_ok():
                return self._mixed_chunk_step()
            # A decode row within C of max_len blocks garbage chunk writes:
            # single-step it until it finishes (it is about to, by the
            # admission-time max_len validation).
            return self.step()
        return self._decode_quantum(burst)

    def _decode_quantum(self, burst: Optional[int]):
        if not self._by_slot:
            # Only queued/preempted work remains: step() lets PagedEngine
            # readmit; the dense engine returns {} (admission needs a slot).
            return self.step() if self._has_work() else {}
        if burst is None:
            return self.step()
        n = min(
            burst,
            min(r.max_new_tokens - len(r.tokens) for r in self._by_slot.values()),
        )
        n = 1 << (n.bit_length() - 1) if n > 0 else 0  # floor to power of two
        if n <= 1:
            return self.step()
        return self.decode_burst(n)

    def _maybe_finish(self, req: _Request, tok: int) -> None:
        if req.done:
            return
        if len(req.tokens) >= req.max_new_tokens or (
            self.eos_token_id is not None and tok == self.eos_token_id
        ):
            req.done = True
            self._free.append(req.slot)
            del self._by_slot[req.slot]
            # Clear the freed slot's host-side position: stale positions feed
            # the batched decode's [B] position vector, and models with
            # position-dependent regime logic (e.g. Phi-3 longrope) must not
            # see another request's old length.
            self._pos[req.slot] = 0
            self._last_tok[req.slot] = 0

    @property
    def num_active(self) -> int:
        return len(self._by_slot)

    def step(self) -> Dict[int, int]:
        """Decode ONE token for every active slot; returns {rid: token}."""
        if not self._by_slot:
            return {}
        toks = jnp.asarray(self._last_tok[:, None])
        pos = jnp.asarray(self._pos)
        self._key, sub = jax.random.split(self._key)
        nxt, self._cache = self._run(self._step_fn, self._state, toks, self._cache, pos, sub)
        nxt = self._fetch(nxt)
        out: Dict[int, int] = {}
        for slot, req in list(self._by_slot.items()):
            tok = int(nxt[slot])
            req.tokens.append(tok)
            out[req.rid] = tok
            self._pos[slot] += 1
            self._last_tok[slot] = tok
            self._maybe_finish(req, tok)
        # Inactive slots also advanced their pos in the on-device vector? No:
        # _pos is host state only updated for active slots; inactive slots
        # wrote garbage at their stale position, which the causal mask of a
        # future prefill overwrite makes irrelevant.
        return out

    def decode_burst(self, n: int) -> Dict[int, List[int]]:
        """Decode `n` tokens for every active slot in ONE device call.

        Token-identical to n `step()` calls (same sampler key-split
        sequence); the point is amortizing the per-step host round-trip,
        which dominates single-step decode on remote/tunneled devices. A
        slot that finishes (eos / max_new_tokens) mid-burst keeps only its
        tokens up to the finish; the burst's extra KV writes for that slot
        land past its live region (or in the paged engine's scratch page)
        and are overwritten by the next prefill of the slot.
        """
        if not self._by_slot or n <= 0:
            return {}
        toks = jnp.asarray(self._last_tok[:, None])
        pos = jnp.asarray(self._pos)
        out_toks, self._cache, self._key = self._run(
            self._burst_fn, self._state, toks, self._cache, pos, self._key, n=n
        )
        out_toks = self._fetch(out_toks)  # [B, n]
        out: Dict[int, List[int]] = {}
        for slot, req in list(self._by_slot.items()):
            taken: List[int] = []
            for j in range(n):
                tok = int(out_toks[slot, j])
                req.tokens.append(tok)
                taken.append(tok)
                self._pos[slot] += 1
                self._last_tok[slot] = tok
                self._maybe_finish(req, tok)
                if req.done:
                    break
            out[req.rid] = taken
        return out

    def result(self, rid: int) -> List[int]:
        return self._requests[rid].tokens

    def is_done(self, rid: int) -> bool:
        return self._requests[rid].done

    def run_to_completion(self, burst: Optional[int] = None) -> None:
        """Drain all active requests. With `burst` set (e.g. 16), decodes in
        scanned bursts — one device call per burst — bounded by the shortest
        active request's remaining budget so no sequence overshoots its
        max_new_tokens. Burst sizes are bucketed to powers of two (each
        distinct size is a separate compiled program; bucketing caps the
        program count at log2(burst) instead of one per tail length).
        Pending `enqueue()`'d prefills interleave as mixed chunk steps."""
        while self._has_work():
            self.serve_step(burst)

    def _has_work(self) -> bool:
        return bool(self._by_slot) or bool(self._queue) or bool(self._prefill_by_slot)


class PagedEngine(BatchedEngine):
    """Continuous batching over a PAGED KV cache (vLLM-style page pool).

    HBM capacity is `n_pages * page_size` tokens shared by all slots instead
    of `max_batch * max_len` preallocated per slot — short sequences no
    longer reserve worst-case cache. With `reserve="prompt"` (default) only
    the prompt's pages are allocated at `add()` and decode pages are grown
    ON DEMAND as positions cross page boundaries (vLLM semantics: admission
    oversubscribes the pool against worst-case decode); `reserve="full"`
    pre-reserves `prompt + max_new_tokens` so admitted requests can never
    stall. Page 0 is scratch (never allocated) so unassigned table entries
    scatter harmlessly.

    When on-demand growth exhausts the pool (after evicting cold prefix
    pages), the YOUNGEST active request is preempted — its pages are
    released and it is transparently recomputed from `prompt + tokens so
    far` once capacity frees (vLLM's recompute policy; `preemptions`
    counts them). Recompute is numerically exact — with greedy/deterministic
    sampling a preempted request's tokens are identical to an unpreempted
    run (stochastic samplers stay correctly distributed but see a shifted
    key sequence); its prompt prefix can even be restored from
    still-registered prefix pages without recomputation.

    Prefill writes straight through the request's page-table row (no
    post-prefill scatter copy — the row slice IS the slot's cache view).

    Prefix sharing (`prefix_sharing=True`): pages that hold a fully-prompt-
    covered token block are registered in a prefix cache keyed by the exact
    token prefix. A later request whose prompt starts with the same blocks
    maps those pages into its table row instead of recomputing them, and only
    the un-shared suffix is prefilled (at cache offset `shared_len` — the
    causal mask already lets suffix queries attend to the shared pages).
    Shared pages are immutable by construction: prefill writes start at
    `shared_len` and decode writes at `prompt_len`, both past every shared
    page. Registered pages are refcounted by active users and stay resident
    after release; when the pool runs dry, zero-ref prefix pages are evicted
    LRU-first back to the free list.
    """

    def __init__(
        self,
        model,
        max_batch: int = 8,
        max_len: int = 512,
        n_pages: int = 64,
        page_size: int = 64,
        kv_quant=None,
        eos_token_id: Optional[int] = None,
        sample_fn: Optional[Callable] = None,
        prefix_sharing: bool = True,
        prefill_chunk: Optional[int] = None,
        reserve: str = "prompt",
    ):
        if reserve not in ("prompt", "full"):
            raise ValueError('reserve must be "prompt" or "full"')
        self.reserve = reserve
        # Paged attributes must exist before super().__init__ runs the
        # overridden _make_cache (the dense pool is never materialized —
        # that preallocation would defeat the paged cache's capacity point).
        self.page_size = page_size
        self.n_pages = n_pages
        self.pages_per_slot = (max_len + page_size - 1) // page_size
        super().__init__(
            model, max_batch=max_batch, max_len=max_len, kv_quant=kv_quant,
            eos_token_id=eos_token_id, sample_fn=sample_fn,
            prefill_chunk=prefill_chunk,
        )
        self._table = np.zeros((max_batch, self.pages_per_slot), np.int32)
        self._free_pages = list(range(1, n_pages))  # page 0 reserved
        self._slot_pages: Dict[int, List[int]] = {}
        # Prefix sharing is OFF under the ring hybrid: a suffix prefill's
        # queries need window keys from inside the shared region, and the
        # dependency compounds by W per sliding layer (the same reason
        # vLLM disables prefix caching for sliding-window models) — exact
        # sharing would require re-prefilling essentially everything.
        self.prefix_sharing = prefix_sharing and not getattr(
            self, "_ring_hybrid", False
        )
        self._prefix_pages: Dict[bytes, int] = {}  # token-prefix key → page id
        self._page_key: Dict[int, bytes] = {}  # page id → its prefix key
        self._page_refs: Dict[int, int] = {}  # prefix page → active users
        self._prefix_lru: List[bytes] = []  # oldest first
        self.prefix_hits = 0  # shared pages reused (stats)
        self.prefix_tokens_saved = 0  # prompt tokens not recomputed
        self._pending: List[_Request] = []  # preempted, awaiting readmission
        self.preemptions = 0  # requests preempted under pool pressure (stats)

    def _make_cache(self, kv_quant):
        from ..tensor.kv_cache import init_quantized_kv_cache
        from ..tensor.paged_kv import init_paged_kv_cache

        c = self.model.config
        n_layers = getattr(c, "num_hidden_layers", None) or c.n_layer
        heads = getattr(c, "num_key_value_heads", None) or getattr(
            c, "num_attention_heads", None
        ) or c.n_head
        hidden = getattr(c, "hidden_size", None) or c.n_embd
        all_heads = getattr(c, "num_attention_heads", None) or c.n_head
        head_dim = getattr(c, "head_dim", None) or hidden // all_heads
        paged = init_paged_kv_cache(
            n_layers, self.n_pages, self.page_size, self.max_batch,
            self.pages_per_slot, heads, head_dim,
            kv_quant=kv_quant, dtype=c.dtype,
        )
        # Paged + ring HYBRID for sliding-window families: sliding layers
        # get dense W-slot ring buffers (tiny — no point paging a 128-token
        # window) while full layers share the page pool. The model's
        # per-layer dispatch (models/sliding.use_ring) composes them.
        w = getattr(c, "sliding_window", None)
        lt = getattr(c, "layer_types", None)
        self._ring_hybrid = bool(
            w is not None and lt is not None and w < self.max_len
            and any(t == "sliding_attention" for t in lt)
        )
        if not self._ring_hybrid:
            return paged
        def ring_layer():
            if kv_quant is not None:
                return init_quantized_kv_cache(
                    1, self.max_batch, w, heads, head_dim, kv_quant
                )[0]
            shape = (self.max_batch, w, heads, head_dim)
            return (jnp.zeros(shape, c.dtype), jnp.zeros(shape, c.dtype))
        return tuple(
            ring_layer() if lt[i] == "sliding_attention" else paged[i]
            for i in range(n_layers)
        )

    def _with_table(self, cache, table_rows):
        table = jnp.asarray(table_rows)
        return tuple(
            dataclasses.replace(layer, _table=table) if hasattr(layer, "_table") else layer
            for layer in cache
        )

    def _slot_view(self, slot: int):
        """Batch-1 cache view for `slot`: paged layers via their table row
        (writes land in the shared pool in place); hybrid dense ring layers
        via a row slice (scattered back by `_merge_slot_view`)."""
        view = self._with_table(self._cache, self._table[slot : slot + 1])
        if not getattr(self, "_ring_hybrid", False):
            return view
        sl = jnp.int32(slot)
        return tuple(
            layer if hasattr(layer, "_table")
            else jax.tree_util.tree_map(
                lambda a: jax.lax.dynamic_slice_in_dim(a, sl, 1, axis=0), layer
            )
            for layer in view
        )

    def _merge_slot_view(self, view, slot: int):
        """Fold a post-prefill slot view back into the pooled cache."""
        if not getattr(self, "_ring_hybrid", False):
            return self._with_table(view, self._table)
        sl = jnp.int32(slot)

        def put(big, small):
            return jax.lax.dynamic_update_slice(
                big, small.astype(big.dtype), (sl,) + (0,) * (big.ndim - 1)
            )

        return tuple(
            self._with_table((v,), self._table)[0] if hasattr(v, "_table")
            else jax.tree_util.tree_map(put, big, v)
            for big, v in zip(self._cache, view)
        )

    def _prefix_key(self, prompt: np.ndarray, n_pages: int) -> bytes:
        """Exact-match key for the first `n_pages` full token blocks."""
        return prompt[: n_pages * self.page_size].tobytes()

    def _lru_touch(self, key: bytes) -> None:
        if key in self._prefix_lru:
            self._prefix_lru.remove(key)
        self._prefix_lru.append(key)

    def _evict_prefix_pages(self, n_needed: int) -> None:
        """Evict zero-ref prefix pages (oldest first) until `n_needed` pages
        are free."""
        for key in list(self._prefix_lru):
            if len(self._free_pages) >= n_needed:
                return
            page = self._prefix_pages[key]
            if self._page_refs.get(page, 0) == 0:
                del self._prefix_pages[key]
                del self._page_key[page]
                self._page_refs.pop(page, None)
                self._prefix_lru.remove(key)
                self._free_pages.append(page)

    def add_batch(self, prompts, max_new_tokens=64) -> List[int]:
        # Batched pooled-cache prefill is not wired for the paged table path
        # (per-row chunk writes through page tables + prefix sharing need
        # their own validation); serial add() preserves correctness.
        budgets = (
            list(max_new_tokens)
            if isinstance(max_new_tokens, (list, tuple))
            else [max_new_tokens] * len(prompts)
        )
        return [self.add(p, m) for p, m in zip(prompts, budgets)]

    def add(self, prompt_ids, max_new_tokens: int = 64) -> int:
        if not self._free:
            raise RuntimeError("no free slots (call step() until one finishes)")
        prompt = np.asarray(prompt_ids, np.int32).reshape(-1)
        total = len(prompt) + max_new_tokens
        if total > self.max_len:
            raise ValueError("prompt + max_new_tokens exceeds engine max_len")
        reserve_tokens = total if self.reserve == "full" else len(prompt)
        slot, last_logits = self._admit(prompt, reserve_tokens)

        self._key, sub = jax.random.split(self._key)
        first_tok = int(self._sample_host(last_logits, sub)[0])
        self._pos[slot] = len(prompt)
        self._last_tok[slot] = first_tok
        rid = self._next_rid
        self._next_rid += 1
        req = _Request(rid, slot, len(prompt), max_new_tokens, [first_tok], prompt=prompt)
        self._requests[rid] = req
        self._by_slot[slot] = req
        self._maybe_finish(req, first_tok)
        return rid

    def _admit(self, prompt: np.ndarray, reserve_tokens: int):
        """Map shared prefix pages, allocate pages covering the first
        `reserve_tokens` positions, and prefill the un-shared suffix of
        `prompt` through the slot's table row. Returns (slot, last-token
        logits). Shared by fresh admission and preemption recompute (where
        `prompt` is the original prompt + tokens generated so far)."""
        ps = self.page_size
        n_total = (reserve_tokens + ps - 1) // ps

        # 1. Longest chain of already-cached full prompt pages (keep at least
        # one prompt token un-shared so prefill still emits last-token logits).
        shared: List[int] = []
        if self.prefix_sharing:
            max_shareable = (len(prompt) - 1) // ps
            for i in range(max_shareable):
                page = self._prefix_pages.get(self._prefix_key(prompt, i + 1))
                if page is None:
                    break
                shared.append(page)
        shared_len = len(shared) * ps

        # 2. Allocate the rest, evicting cold prefix pages if needed.
        n_new = n_total - len(shared)
        if n_new > len(self._free_pages):
            self._evict_prefix_pages(n_new)
        if n_new > len(self._free_pages):
            raise RuntimeError("page pool exhausted")
        slot = self._free.pop()
        pages = shared + [self._free_pages.pop() for _ in range(n_new)]
        for i, page in enumerate(shared):
            self._page_refs[page] = self._page_refs.get(page, 0) + 1
            self._lru_touch(self._prefix_key(prompt, i + 1))
        if shared:
            self.prefix_hits += len(shared)
            self.prefix_tokens_saved += shared_len
        self._slot_pages[slot] = pages
        self._table[slot] = 0
        self._table[slot, : len(pages)] = pages

        # 3. Prefill the un-shared suffix through the slot's table row (the
        # sliced view writes the shared pool pages in place).
        cache_view = self._slot_view(slot)
        last_logits, cache_view = self._prefill_into(
            cache_view, prompt[shared_len:], start_pos=shared_len
        )
        self._cache = self._merge_slot_view(cache_view, slot)

        # 4. Register this prompt's new fully-covered pages for future reuse.
        if self.prefix_sharing:
            for i in range(len(shared), len(prompt) // ps):
                key = self._prefix_key(prompt, i + 1)
                if key in self._prefix_pages:
                    continue  # concurrent duplicate: keep the existing entry
                page = pages[i]
                self._prefix_pages[key] = page
                self._page_key[page] = key
                self._page_refs[page] = self._page_refs.get(page, 0) + 1
                self._lru_touch(key)
        return slot, last_logits

    # --- on-demand page growth + preemption -------------------------------

    def _release_slot_pages(self, slot: int) -> None:
        """Return a slot's pages to the pool (prefix-registered pages stay
        resident; their refcount drops and eviction reclaims them)."""
        pages = self._slot_pages.pop(slot, [])
        for page in pages:
            if page in self._page_key:
                self._page_refs[page] = max(0, self._page_refs.get(page, 1) - 1)
            else:
                self._free_pages.append(page)
        self._table[slot] = 0

    def _preempt(self, req: _Request) -> None:
        """Release `req`'s slot and pages under pool pressure; it will be
        recomputed from prompt + generated tokens when capacity frees."""
        self._release_slot_pages(req.slot)
        self._cache = self._with_table(self._cache, self._table)
        del self._by_slot[req.slot]
        self._free.append(req.slot)
        self._pos[req.slot] = 0
        self._last_tok[req.slot] = 0
        self._pending.append(req)
        self.preemptions += 1

    def _try_readmit(self) -> None:
        """Re-admit preempted requests (oldest first) while slots and pages
        allow. Recompute is exact: the readmitted context is the original
        prompt + all generated tokens except the last (whose KV the next
        decode step writes, exactly as in the unpreempted schedule)."""
        while self._pending and self._free:
            req = self._pending[0]
            ctx = np.concatenate(
                [req.prompt, np.asarray(req.tokens[:-1], np.int32)]
            ).astype(np.int32)
            reserve_tokens = (
                req.prompt_len + req.max_new_tokens
                if self.reserve == "full"
                else len(ctx)
            )
            try:
                slot, _ = self._admit(ctx, reserve_tokens)
            except RuntimeError:
                if not self._by_slot:
                    raise RuntimeError(
                        "page pool too small to readmit a preempted request; "
                        "increase n_pages"
                    ) from None
                return  # retry when active requests release pages
            self._pending.pop(0)
            req.slot = slot
            self._pos[slot] = len(ctx)
            self._last_tok[slot] = req.tokens[-1]
            self._by_slot[slot] = req

    def _grow_for_decode(self, n: int) -> None:
        """Ensure every active slot's table row covers its next `n` write
        positions (capped at the request's remaining budget — a slot that
        finishes mid-burst parks its extra writes in the scratch page).
        Pool pressure evicts cold prefix pages first, then preempts the
        youngest active request until the rest fit."""
        while True:
            need: Dict[int, int] = {}
            for slot, req in self._by_slot.items():
                remaining = req.max_new_tokens - len(req.tokens)
                last_pos = int(self._pos[slot]) + min(n, remaining) - 1
                k = last_pos // self.page_size + 1 - len(self._slot_pages[slot])
                if k > 0:
                    need[slot] = k
            total = sum(need.values())
            if total == 0:
                return
            if total > len(self._free_pages):
                self._evict_prefix_pages(total)
            if total <= len(self._free_pages):
                break
            if len(self._by_slot) == 1:
                raise RuntimeError(
                    "page pool exhausted by a single request; increase n_pages"
                )
            self._preempt(max(self._by_slot.values(), key=lambda r: r.rid))
        for slot, k in need.items():
            row = self._slot_pages[slot]
            pages = [self._free_pages.pop() for _ in range(k)]
            self._table[slot, len(row) : len(row) + k] = pages
            row.extend(pages)
        self._cache = self._with_table(self._cache, self._table)

    def _has_work(self) -> bool:
        return super()._has_work() or bool(self._pending)

    def enqueue(self, prompt_ids, max_new_tokens: int = 64) -> int:
        # Mixed chunk steps write a garbage chunk through EVERY row's page
        # table, which the paged allocator does not reserve pages for (the
        # same reason add_batch stays serial here); blocking add() preserves
        # correctness.
        return self.add(prompt_ids, max_new_tokens)

    def step(self) -> Dict[int, int]:
        self._try_readmit()
        if self._by_slot:
            self._grow_for_decode(1)
        return super().step()

    def decode_burst(self, n: int) -> Dict[int, List[int]]:
        self._try_readmit()
        if self._by_slot:
            self._grow_for_decode(n)
        return super().decode_burst(n)

    def _maybe_finish(self, req: _Request, tok: int) -> None:
        was_done = req.done
        super()._maybe_finish(req, tok)
        if req.done and not was_done:
            # Release the slot's pages: prefix-registered pages stay resident
            # (refcount drops; eviction reclaims them under pressure), the
            # rest return to the free pool.
            self._release_slot_pages(req.slot)
            self._cache = self._with_table(self._cache, self._table)


class DistributedEngine(BatchedEngine):
    """Multi-host SPMD serving over a GLOBAL mesh (`parallel.global_mesh`).

    Every process runs the SAME engine loop: the model is sharded over the
    global mesh (tp across ICI, optionally sp; dp axes replicate), the
    pooled cache shards congruently, and each jitted program executes as one
    SPMD computation across all hosts — the multi-host analogue of the
    single-process mesh engine (BASELINE.md scaling north star: 1 chip ->
    1 host -> multi-host).

    Correctness contract (standard SPMD serving): all processes must submit
    IDENTICAL request streams in identical order — the host scheduler is
    deterministic, so the program sequence stays in lockstep and every
    process decodes identical tokens (`tests/parallel/multiproc_worker.py`
    scenario "serving" asserts exactly this). Use `broadcast_prompts` to
    distribute a frontend's requests from process 0.

    Host fetches go through the multi-process-safe `_fetch` (addressable
    shard for replicated results, `process_allgather` otherwise), and
    sampling always runs as a device program (`_sample_only_fn`) — eager
    ops on non-fully-addressable arrays are illegal.
    """

    def _fetch(self, x) -> np.ndarray:
        if getattr(x, "is_fully_addressable", True):
            return np.asarray(jax.device_get(x))
        if x.sharding.is_fully_replicated:
            return np.asarray(x.addressable_data(0))
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))

    @staticmethod
    def broadcast_prompts(prompts, max_prompt_len: int, count: int, source_has: bool):
        """Distribute a ragged prompt list from process 0 to all processes.

        `count`/`max_prompt_len` bound the fixed-size broadcast buffer and
        must be the same on every process (agree on them out of band —
        e.g. engine max_len / max_batch). `source_has` is True on the
        process that owns `prompts` (process 0); others pass prompts=None.
        Returns the list of int lists, identical everywhere.
        """
        from jax.experimental import multihost_utils

        buf = np.full((count, max_prompt_len + 1), -1, np.int32)
        if source_has and prompts:
            for i, p in enumerate(prompts[:count]):
                p = np.asarray(p, np.int32).reshape(-1)
                if len(p) > max_prompt_len:
                    # Raise BEFORE entering the collective with a clear
                    # message (an exception mid-broadcast on the owner
                    # leaves the other processes blocked with no context;
                    # SPMD failure semantics still require killing them,
                    # but the error now says why).
                    raise ValueError(
                        f"prompt {i} has {len(p)} tokens > max_prompt_len "
                        f"{max_prompt_len}; truncate or raise the bound "
                        "(same value on every process)"
                    )
                buf[i, 0] = len(p)
                buf[i, 1 : 1 + len(p)] = p
        buf = np.asarray(multihost_utils.broadcast_one_to_all(buf))
        out = []
        for row in buf:
            n = int(row[0])
            if n < 0:
                break
            out.append(row[1 : 1 + n].tolist())
        return out
