"""Trainer: sharded RL-style trie training with cost-model-balanced packing.

Closes the loop the reference runs offline across processes (stats JSONL →
remark → TreeTimeModel → data_parallel binning → per-GPU run, reference:
exp/exp_dp_TM.py): every step, the incoming rollout batch is partitioned into
per-data-rank tries by the live TreeTimeModel, trained in one sharded step,
and the measured step time feeds the model back.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Iterable

import jax
import numpy as np

from dynamictreeattn_tpu.engine import EngineConfig
from dynamictreeattn_tpu.models.qwen3 import Qwen3Config, init_params
from dynamictreeattn_tpu.parallel import (
    LB_by_DFS_and_TM,
    LB_by_n_tokens,
    TreeTimeModel,
    init_opt_state,
    make_mesh,
    make_train_step,
    shard_params,
    stack_batches,
)
from dynamictreeattn_tpu.tries import TokenTrie, trie_stats

__all__ = ["TrainConfig", "Trainer"]


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    dp: int = 1
    tp: int = 1
    sp: int = 1  # sequence parallelism over the "seq" axis
    sp_mode: str = "ulysses"  # or "ring" (no kv-head limit on sp)
    pp: int = 1  # pipeline stages over the "pipe" axis
    pp_schedule: str = "gpipe"  # or "1f1b" (O(pp) activation memory)
    microbatches: int = 4  # microbatches per data rank when pp > 1
    learning_rate: float = 1e-5
    warmup_steps: int = 0  # linear warmup into a constant schedule
    weight_decay: float = 0.0
    grad_clip: float = 1.0
    grad_accum: int = 1  # optax.MultiSteps microbatch accumulation
    fsdp: bool = False  # ZeRO-3 param/grad/opt-state sharding over "data"
    ep: bool = False  # MoE expert parallelism over "data" (token all-to-all)
    fsdp_min_size: int = 1 << 16  # leave smaller per-layer leaves replicated
    param_dtype: str = "bf16"
    lb_method: str = "LB_by_DFS_and_TM"  # or "LB_by_n_tokens"
    lb_block_size: int = 2048
    ckpt_dir: str | None = None
    ckpt_every: int = 0  # 0 = only on demand
    log_every: int = 1
    skip_nonfinite: bool = True  # drop updates from non-finite-loss steps
    multihost: bool = False  # place params/batches via put_global (every
    #   process must feed identical global rollout batches per step)


class Trainer:
    def __init__(
        self,
        model_config: Qwen3Config,
        engine_config: EngineConfig = EngineConfig(),
        train_config: TrainConfig = TrainConfig(),
        mesh=None,
        custom_loss=None,
        extras_spec: dict | None = None,
    ):
        """`custom_loss(lp_rows, ent_rows, extras, length)` swaps the linear
        weighted loss for the reference's pluggable per-sequence contract at
        scale (clipped-ratio GRPO); `extras_spec` maps each extras name to
        its per-sequence ndim (0 = scalar, 1 = per-edge vector). Pass the
        matching per-sequence values to train_step(..., extras=...)."""
        import optax

        self.mc = model_config
        self.ec = engine_config
        self.tc = train_config
        self.mesh = mesh or make_mesh(
            dp=train_config.dp, tp=train_config.tp, sp=train_config.sp,
            pp=train_config.pp,
        )
        self.time_model = TreeTimeModel()
        self.step_idx = 0
        self.history: list[dict] = []

        tx = []
        if train_config.grad_clip:
            tx.append(optax.clip_by_global_norm(train_config.grad_clip))
        lr = train_config.learning_rate
        if train_config.warmup_steps:
            # 10%→100% linear warmup (starting exactly at 0 would zero the
            # first update entirely)
            lr = optax.linear_schedule(0.1 * lr, lr, train_config.warmup_steps)
        tx.append(optax.adamw(lr, weight_decay=train_config.weight_decay))
        opt = optax.chain(*tx)
        if train_config.grad_accum > 1:
            opt = optax.MultiSteps(opt, every_k_schedule=train_config.grad_accum)
        self.optimizer = opt
        if train_config.pp > 1:
            from dynamictreeattn_tpu.parallel import make_pp_train_step

            if train_config.fsdp:
                raise ValueError("fsdp + pipeline not supported yet")
            if train_config.ep:
                raise ValueError(
                    "ep (data-axis expert parallelism) + pipeline not "
                    "supported yet"
                )
            self._step_fn = make_pp_train_step(
                self.mc, self.mesh, self.ec, optimizer=self.optimizer,
                schedule=train_config.pp_schedule,
            )
        else:
            if custom_loss is not None and train_config.pp > 1:
                raise ValueError("custom_loss requires pp == 1")
            self._step_fn = make_train_step(
                self.mc, self.mesh, self.ec, optimizer=self.optimizer,
                fsdp=train_config.fsdp,
                fsdp_min_size=train_config.fsdp_min_size,
                ep=train_config.ep,
                sp_mode=train_config.sp_mode,
                custom_loss=custom_loss,
                extras_spec=extras_spec,
            )
        self.custom_loss = custom_loss
        self.extras_spec = extras_spec or {}
        self.params = None
        self.opt_state = None
        self._fwd_fn = None
        self._ckpt = None
        if train_config.ckpt_dir:
            from dynamictreeattn_tpu.training.checkpoint import CheckpointManager

            self._ckpt = CheckpointManager(train_config.ckpt_dir)

    # ------------------------------------------------------------------ state
    def init(self, seed: int = 0) -> None:
        import jax.numpy as jnp

        dtype = jnp.bfloat16 if self.tc.param_dtype == "bf16" else jnp.float32
        params = init_params(self.mc, jax.random.key(seed), dtype=dtype)
        self.set_params(params)

    def set_params(self, params) -> None:
        ep = (self.mesh.shape["data"] if (self.tc.ep and self.mc.is_moe)
              else 1)
        placer = None
        if self.tc.multihost:
            from dynamictreeattn_tpu.parallel.distributed import global_placer

            placer = global_placer  # spec selection stays in shard_params*
        if self.tc.pp > 1:
            from dynamictreeattn_tpu.parallel import shard_params_pp

            self.params = shard_params_pp(
                params, self.mesh, self.mc, placer=placer
            )
        else:
            self.params = shard_params(
                params, self.mesh, self.mc, fsdp=self.tc.fsdp,
                fsdp_min_size=self.tc.fsdp_min_size,
                ep=ep, placer=placer,
            )
        self.opt_state = init_opt_state(self.optimizer, self.params)

    def save(self, extra: dict | None = None) -> None:
        assert self._ckpt, "no ckpt_dir configured"
        if self.tc.multihost:
            # device_get raises on arrays spanning non-addressable devices;
            # gather the full values to every host first
            from jax.experimental import multihost_utils

            params = multihost_utils.process_allgather(self.params, tiled=True)
            opt_state = multihost_utils.process_allgather(
                self.opt_state, tiled=True
            )
            # only process 0 writes: on shared storage (GCS/NFS, the norm on
            # pods) concurrent identical writes race and can corrupt the
            # checkpoint; restore() re-reads per host anyway
            if jax.process_index() == 0:
                self._ckpt.save(
                    self.step_idx, params, opt_state,
                    extra={"step": self.step_idx, **(extra or {})},
                )
            multihost_utils.sync_global_devices("dta_ckpt_save")
            return
        params = jax.device_get(self.params)
        opt_state = jax.device_get(self.opt_state)
        self._ckpt.save(
            self.step_idx, params, opt_state,
            extra={"step": self.step_idx, **(extra or {})},
        )

    def restore(self, step: int | None = None) -> None:
        assert self._ckpt, "no ckpt_dir configured"
        out = self._ckpt.restore(step)
        self.set_params(out["params"])
        if out.get("opt_state") is not None:
            # re-shard restored opt state to match the freshly-inited layout
            # (make_array_from_callback also covers multihost, where a plain
            # device_put to non-addressable devices would fail)
            def _place(like, val):
                if not hasattr(like, "sharding"):
                    return val
                a = jax.device_get(val)
                return jax.make_array_from_callback(
                    a.shape, like.sharding, lambda idx: a[idx]
                )

            self.opt_state = jax.tree.map(_place, self.opt_state, out["opt_state"])
        extra = out.get("extra") or {}
        self.step_idx = int(extra.get("step", step or 0))

    # ------------------------------------------------------------------ steps
    def partition(self, seqs, attachs, n_bins: int | None = None) -> list[TokenTrie]:
        """Split one rollout batch into per-device (or per-microbatch) tries."""
        tries, _ = self.partition_with_ids(seqs, attachs, n_bins)
        return tries

    def partition_with_ids(self, seqs, attachs, n_bins: int | None = None):
        """(tries, bins): bins[r][j] = original index of the sequence whose
        _sequence_batch_id is j within rank r's trie."""
        dp = n_bins if n_bins is not None else self.mesh.shape["data"]
        if dp == 1:
            bins = [list(range(len(seqs)))]
        elif self.tc.lb_method == "LB_by_n_tokens":
            bins = LB_by_n_tokens(seqs, dp)
        else:
            bins = LB_by_DFS_and_TM(
                seqs, self.time_model, dp, block_size=self.tc.lb_block_size
            )
        tries, out_bins = [], []
        for ids in bins:
            ids = ids or [int(np.argmin([len(s) for s in seqs]))]  # never empty
            tries.append(
                TokenTrie([seqs[i] for i in ids], [attachs[i] for i in ids])
            )
            out_bins.append(list(ids))
        return tries, out_bins

    def rollout(self, prompts, prompt_lens, group: int, max_new: int,
                key=None, temperature: float = 1.0, greedy: bool = False,
                eos_id: int | None = None, top_k: int = 0,
                top_p: float | None = None, min_p: float | None = None):
        """Sample `group` completions per prompt with the CURRENT policy.

        The rollout side of the RL loop at trainer scale: params may be
        sharded (TP / FSDP / EP / PP) — they are gathered to full replicated
        values for the sampler, which is data-parallel over prompt rows
        (pass prompts device_put with a P("data", None) sharding to scale
        rollouts over the mesh; tests/test_generate.py shows the pattern).
        Returns [P, group, max_new] int32 (`models.generate_grouped`
        semantics: eos_id forces eos tails and decode exits early once every
        branch finished). The gather costs one host round-trip per call
        (same path save() uses) — amortize by sampling a full batch of
        prompt groups per call."""
        assert self.params is not None, "call init()/restore() first"
        from dynamictreeattn_tpu.models.generate import generate_grouped

        if self.tc.multihost:
            from jax.experimental import multihost_utils

            params = multihost_utils.process_allgather(self.params, tiled=True)
        else:
            params = jax.device_get(self.params)
        return generate_grouped(
            params, self.mc, prompts, prompt_lens, group, max_new,
            key=key, temperature=temperature, greedy=greedy, eos_id=eos_id,
            top_k=top_k, top_p=top_p, min_p=min_p,
        )

    def forward_logprobs(self, seqs, attachs) -> list:
        """Behavior logprobs for a rollout batch, sharded over the mesh
        (engine.forward at scale — the RL ratio denominators, reference:
        tree_training_engine.py:516-553). Returns a list aligned with
        `seqs`: fp32 arrays of length len(seq)-1."""
        assert self.params is not None, "call init()/restore() first"
        if self.tc.pp > 1 or self.tc.sp > 1:
            raise ValueError("forward_logprobs does not support pp/sp>1 yet")
        if self._fwd_fn is None:
            from dynamictreeattn_tpu.parallel import make_forward_step

            self._fwd_fn = make_forward_step(
                self.mc, self.mesh, self.ec,
                fsdp=self.tc.fsdp, fsdp_min_size=self.tc.fsdp_min_size,
                ep=self.tc.ep,
            )
        tries, bins = self.partition_with_ids(seqs, attachs)
        batch = stack_batches(tries, self.ec, device=not self.tc.multihost)
        arrays = batch.arrays
        if self.tc.multihost:
            from dynamictreeattn_tpu.parallel import batch_partition_specs
            from dynamictreeattn_tpu.parallel.distributed import put_global

            specs = batch_partition_specs(cache_sched=True)
            arrays = put_global(arrays, self.mesh,
                                {f: specs[f] for f in arrays})
        from dynamictreeattn_tpu.parallel import extract_forward

        lp, _ = self._fwd_fn(self.params, arrays)
        if self.tc.multihost:
            # lp spans non-addressable devices; gather it everywhere first
            from jax.experimental import multihost_utils

            lp = multihost_utils.process_allgather(lp, tiled=True)
        per_rank = extract_forward(batch, lp)
        out = [None] * len(seqs)
        for r, ids in enumerate(bins):
            for j, orig in enumerate(ids):
                out[orig] = per_rank[r][j]
        return out

    def _extras_arrays(self, batch, bins, extras: dict) -> dict:
        """Per-sequence extras (aligned with the input order) → x_<name>
        arrays [dp, S, ...] in each rank's _sequence_batch_id order."""
        import jax.numpy as jnp

        S = int(np.asarray(batch.arrays["seq_lens"]).shape[1])
        width = int(np.asarray(batch.arrays["seq_paths"]).shape[2]) - 1
        out = {}
        for name, nd in self.extras_spec.items():
            vals = extras[name]
            if nd == 0:
                a = np.zeros((len(bins), S), np.float32)
                for r, ids in enumerate(bins):
                    for j, orig in enumerate(ids):
                        a[r, j] = float(vals[orig])
            elif nd == 1:
                a = np.zeros((len(bins), S, width), np.float32)
                for r, ids in enumerate(bins):
                    for j, orig in enumerate(ids):
                        v = np.asarray(vals[orig], np.float32)
                        a[r, j, : len(v)] = v[:width]
            else:
                raise ValueError(f"extras ndim {nd} not supported")
            out["x_" + name] = a if self.tc.multihost else jnp.asarray(a)
        return out

    def train_step(self, seqs, attachs, extras: dict | None = None) -> dict:
        assert self.params is not None, "call init()/restore() first"
        if self.custom_loss is not None and extras is None:
            extras = {}
        if self.tc.pp > 1:
            from dynamictreeattn_tpu.parallel import stack_microbatches

            dp, M = self.mesh.shape["data"], self.tc.microbatches
            flat = self.partition(seqs, attachs, n_bins=dp * M)
            tries = flat  # cost-model features below cover every bin
            rows = [flat[r * M:(r + 1) * M] for r in range(dp)]
            batch = stack_microbatches(rows, self.ec)
        else:
            tries, bins = self.partition_with_ids(seqs, attachs)
            batch = stack_batches(
                tries, self.ec, sp=self.mesh.shape.get("seq", 1),
                sp_mode=self.tc.sp_mode,
                device=not self.tc.multihost,
                with_paths=self.custom_loss is not None,
            )
            if self.custom_loss is not None:
                batch.arrays.update(
                    self._extras_arrays(batch, bins, extras)
                )
        arrays = batch.arrays
        if self.tc.multihost:
            from dynamictreeattn_tpu.parallel import batch_partition_specs
            from dynamictreeattn_tpu.parallel.distributed import put_global

            specs = batch_partition_specs(
                self.mesh.shape.get("seq", 1), self.tc.sp_mode,
                extras_spec=(self.extras_spec if self.custom_loss is not None
                             else None),
                cache_sched=True,  # superset; placement filters by arrays
            )
            arrays = put_global(
                arrays, self.mesh, {f: specs[f] for f in arrays}
            )
        t0 = time.time()
        new_params, new_opt, loss, aux = self._step_fn(
            self.params, self.opt_state, arrays
        )
        # ONE host round-trip for every scalar this step logs: on a
        # tunneled/remote chip each separate float() is a full network RTT
        # (measured ~20 ms apiece — 3 separate syncs cost more than the
        # whole host-side batching pipeline)
        loss, aux = jax.device_get((loss, aux))
        loss = float(loss)
        dt = time.time() - t0
        # the step DONATES params/opt_state (in-place update, no second copy
        # of the adamw moments) — always rebind; on a non-finite loss the
        # step already applied a zero update in-graph (train.py opt_step),
        # so rebinding keeps the previous parameters
        self.params, self.opt_state = new_params, new_opt
        if self.tc.skip_nonfinite and not np.isfinite(loss):
            # poisoned batch (bad rollout / overflow): update was zeroed
            # in-graph; record and continue — basic training robustness the
            # reference (grads-only, no loop) never needed
            self.skipped_steps = getattr(self, "skipped_steps", 0) + 1
            self.step_idx += 1
            rec = {"step": self.step_idx, "loss": loss, "skipped": True,
                   "time": dt, "n_sequences": len(seqs)}
            self.history.append(rec)
            return rec
        self.step_idx += 1

        # feed the cost model: with dp=1 the attribution is exact; with dp>1
        # the step time is attributed to the largest bin (the makespan bin)
        feats = [
            trie_stats(t.lens, t.lcp_lens, mode="backward",
                       block_size=self.tc.lb_block_size)
            for t in tries
        ]
        biggest = max(feats, key=lambda s: s["n_tree_tokens"])
        fit_dt = dt
        if self.tc.multihost:
            # every process must fit IDENTICAL cost models or the next
            # step's binning (and therefore put_global's identical-global-
            # values contract) diverges — use process 0's timing everywhere
            from jax.experimental import multihost_utils

            fit_dt = float(
                multihost_utils.broadcast_one_to_all(np.float32(dt))
            )
        self.time_model.add_data(dict(biggest, time=fit_dt))

        rec = {
            "step": self.step_idx,
            "loss": loss,
            "time": dt,
            "n_sequences": len(seqs),
            "n_tokens": int(sum(len(s) for s in seqs)),
            "n_tree_tokens": int(sum(f["n_tree_tokens"] for f in feats)),
            "sum_logprob": float(aux["sum_logprob"]),
            "sum_entropy": float(aux["sum_entropy"]),
        }
        self.history.append(rec)
        if self._ckpt and self.tc.ckpt_every and self.step_idx % self.tc.ckpt_every == 0:
            self.save()
        return rec

    def fit(self, batches: Iterable, log_fn: Callable[[dict], None] = None) -> list[dict]:
        for seqs, attachs in batches:
            rec = self.train_step(seqs, attachs)
            if log_fn and self.step_idx % self.tc.log_every == 0:
                log_fn(rec)
        return self.history
