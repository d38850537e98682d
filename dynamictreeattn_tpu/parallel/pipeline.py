"""Pipeline parallelism over the "pipe" mesh axis (GPipe and 1F1B).

Beyond-reference capability (the reference has no pipeline parallelism,
SURVEY.md §2.3): the layer stack is split into `pp` contiguous stages
(layers stay stacked [L, ...] and shard over "pipe" on the L axis), a batch
of M packed tries per data rank is streamed through as microbatches, and
activations hop stage→stage with `lax.ppermute` inside a `lax.scan`.

Two schedules:

* ``schedule="gpipe"`` — all-forward-then-all-backward over M + pp − 1 ticks;
  `jax.grad` through the scan transposes the ppermutes into the reverse hops,
  so the backward pipeline needs no hand-written schedule. Activation memory
  grows with M (every tick's carry is saved for the transpose).
* ``schedule="1f1b"`` — steady-state one-forward-one-backward over
  M + 2(pp − 1) ticks with a hand-written per-tick `jax.vjp` backward.
  Stage s runs fwd of microbatch ``t − s`` and bwd of microbatch
  ``t − 2(pp−1) + s`` in the same tick; activation cotangents hop backward
  via the reversed ppermute. Only the stage INPUT of each in-flight
  microbatch is stashed (a ring buffer of 2·pp − 1 slots — O(pp), not O(M))
  and the stage forward is recomputed inside the vjp, so memory is bounded
  regardless of microbatch count at the cost of one extra stage forward
  (the same trade `jax.checkpoint` makes). Gradients accumulate in fp32.

Composition: works with tensor parallelism over "model" (each stage row has
its own TP group; the vocab-parallel embed/loss collectives run on every
stage and are masked after the fact) and data parallelism over "data"
(gradient psum). Sequence parallelism is mutually exclusive with pipelining
for now (both re-slice the token axis).

Numerical notes: bubble ticks process zero activations — rms_norm(0) = 0 and
the tree mask always admits the diagonal, so bubbles stay finite and their
loss contribution is masked to exactly 0 (no NaN·0 hazards).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from dynamictreeattn_tpu.engine.tree_engine import EngineConfig, resolve_loss_mode
from dynamictreeattn_tpu.models.qwen3 import Qwen3Config, rms_norm, rope_tables
from dynamictreeattn_tpu.ops.tree_attention import BlockSizes, tree_attention
from dynamictreeattn_tpu.ops.tree_attention_ref import tree_attention_reference
from dynamictreeattn_tpu.parallel.collectives import mpar_in
from dynamictreeattn_tpu.parallel.tp_model import _embed_vp, _layer_tp
from dynamictreeattn_tpu.parallel.train import (
    _BATCH_FIELDS,
    _META_FIELDS,
    param_specs,
    stack_batches,
)
from dynamictreeattn_tpu.parallel.vocab_parallel import vp_tree_loss_from_hidden
from dynamictreeattn_tpu.tries import TokenTrie

__all__ = ["pp_param_specs", "shard_params_pp", "stack_microbatches",
           "make_pp_train_step"]


def pp_param_specs(config: Qwen3Config, pp: int) -> dict:
    """param_specs with every stacked layer leaf sharded over "pipe" on the
    layer axis — stage s holds layers [s·L/pp, (s+1)·L/pp)."""
    if config.num_hidden_layers % pp:
        raise ValueError(
            f"{config.num_hidden_layers} layers not divisible by pp={pp}"
        )
    specs = param_specs(config)
    specs["layers"] = {
        k: P(*(("pipe",) + tuple(s)[1:])) for k, s in specs["layers"].items()
    }
    return specs


def shard_params_pp(params: dict, mesh, config: Qwen3Config,
                    placer=None) -> dict:
    specs = pp_param_specs(config, mesh.shape["pipe"])
    put = placer or (lambda x, sh: jax.device_put(x, sh))
    return jax.tree.map(
        lambda x, s: put(x, NamedSharding(mesh, s)),
        params, specs, is_leaf=lambda x: isinstance(x, P),
    )


def stack_microbatches(
    tries: list[list[TokenTrie]], cfg: EngineConfig
) -> "StackedMicrobatch":
    """[dp][M] tries → arrays with leading (dp, M) axes, one common bucket and
    common metadata widths across ALL microbatches (one compiled schedule)."""
    dp = len(tries)
    M = len(tries[0])
    if any(len(row) != M for row in tries):
        raise ValueError("every data rank needs the same microbatch count")
    flat = stack_batches([t for row in tries for t in row], cfg)
    arrays = {
        k: v.reshape(dp, M, *v.shape[1:]) for k, v in flat.arrays.items()
        # the pipelined step runs the schedule-free fused backward
        if k not in ("cache_actions", "cache_flush")
    }
    return StackedMicrobatch(arrays=arrays, packeds=flat.packeds, dp=dp, M=M)


class StackedMicrobatch:
    def __init__(self, arrays, packeds, dp, M):
        self.arrays = arrays
        self.packeds = packeds
        self.dp = dp
        self.M = M


def make_pp_train_step(
    model_config: Qwen3Config,
    mesh,
    engine_config: EngineConfig = EngineConfig(),
    optimizer=None,
    schedule: str = "gpipe",
):
    """Build the jitted pipelined step.

    Without `optimizer`: step(params, batch_arrays) -> (loss, grads, aux).
    With one: step(params, opt_state, batch_arrays) ->
    (params, opt_state, loss, aux). `batch_arrays` comes from
    `stack_microbatches` ([dp, M, ...] leaves). `schedule` picks the
    microbatch schedule: "gpipe" (autodiff backward, memory ∝ M) or "1f1b"
    (hand-written per-tick vjp backward, memory ∝ pp).
    """
    mc, ec = model_config, engine_config
    pp = mesh.shape["pipe"]
    tp = mesh.shape["model"]
    if mesh.shape.get("seq", 1) > 1:
        raise ValueError("pipeline and sequence parallelism are exclusive")
    if schedule not in ("gpipe", "1f1b"):
        raise ValueError(f"unknown pipeline schedule {schedule!r}")
    pspecs = pp_param_specs(mc, pp)
    bspec = {f: P("data", None, None) for f in _BATCH_FIELDS}
    bspec["kv_counts"] = bspec["q_counts"] = P("data", None, None)
    for f in ("kv_ids", "kv_types", "q_ids", "q_types"):
        bspec[f] = P("data", None, None, None)

    perm = [(i, (i + 1) % pp) for i in range(pp)]
    perm_bwd = [(i, (i - 1) % pp) for i in range(pp)]

    # ---- helpers shared by both schedules --------------------------------
    def make_mb_field(batch, M):
        def mb_field(name, mb):
            return jax.lax.dynamic_index_in_dim(
                batch[name][0], jnp.clip(mb, 0, M - 1), axis=0, keepdims=False
            )

        return mb_field

    def make_attn_for(mb_field, mb):
        ld = mb_field("last_desc", mb)
        if ec.attn_backend == "reference":
            return lambda q, k, v: tree_attention_reference(q, k, v, ld)
        meta = tuple(mb_field(f, mb) for f in _META_FIELDS)
        bs = BlockSizes(ec.block_q, ec.block_kv)
        from dynamictreeattn_tpu.engine.tree_engine import resolve_kernel_modes

        fwd_mode, bwd_mode = resolve_kernel_modes(mc, ec)
        if bwd_mode == "cached":
            bwd_mode = "fused"  # no per-microbatch Belady schedule plumbing
        return lambda q, k, v: tree_attention(
            q, k, v, ld, *meta, block_sizes=bs, interpret=ec.interpret,
            softmax_mode=fwd_mode, bwd_mode=bwd_mode,
        )

    def stage_layers(p, x, attn_fn, cos, sin, val):
        body = functools.partial(
            _layer_tp, config=mc, attn_fn=attn_fn, tp=tp, axis="model",
            valid=val,
        )

        def scan_fn(carry, lp):
            x, lb = carry
            out, lb_i = body(x, lp, cos, sin)  # dense: lb_i is 0
            return (out, lb + lb_i), None

        if ec.remat:
            from dynamictreeattn_tpu.models.qwen3 import _remat_policy

            scan_fn = jax.checkpoint(
                scan_fn, prevent_cse=False,
                policy=_remat_policy(ec.remat_policy),
            )
        (x, lb), _ = jax.lax.scan(scan_fn, (x, jnp.float32(0)), p["layers"])
        return x, lb

    def local_step_1f1b(params, batch):
        stage = jax.lax.axis_index("pipe")
        toks = batch["tokens"][0]  # [M, n]
        M, n = toks.shape
        S = 2 * pp - 1  # ring-buffer slots (max in-flight at stage 0)
        dtype = params["layers"]["wq"].dtype
        mb_field = make_mb_field(batch, M)
        make_attn = functools.partial(make_attn_for, mb_field)

        def stage_fwd(p, mb, x_prev):
            """One stage forward (no grad tracking): embed on stage 0, else
            the received activation, through this stage's layers."""
            tok = mb_field("tokens", mb)
            dep = mb_field("depth", mb)
            cos, sin = rope_tables(dep, mc.head_dim, mc.rope_theta,
                                   mc.rope_scaling_tuple)
            x0 = _embed_vp(p["embed"], tok, "model").astype(dtype)
            x_in = jnp.where(stage == 0, x0, x_prev)
            y, _lb = stage_layers(
                p, x_in, make_attn(mb), cos, sin, mb_field("valid", mb)
            )
            return x_in, y

        def stage_out_fn(p, x_in, mb, live, valid):
            """Stage forward + (masked, last-stage-only) loss — the function
            whose vjp produces this stage's param grads and input cotangent.
            The `where` on stage routes d(embed) to stage 0 and dx to the
            received activation elsewhere. The router lb term is per-STAGE
            (each stage's own MoE layers) and masked by `valid` only."""
            tok = mb_field("tokens", mb)
            dep = mb_field("depth", mb)
            cos, sin = rope_tables(dep, mc.head_dim, mc.rope_theta,
                                   mc.rope_scaling_tuple)
            x0 = _embed_vp(p["embed"], tok, "model").astype(dtype)
            xx = jnp.where(stage == 0, x0, x_in)
            y, lb = stage_layers(
                p, xx, make_attn(mb), cos, sin, mb_field("valid", mb)
            )
            h = mpar_in(rms_norm(y, p["final_norm"], mc.rms_norm_eps), "model")
            w_local = p["embed"].T if mc.tie_word_embeddings else p["lm_head"]
            l, aux = vp_tree_loss_from_hidden(
                h, w_local, tok, mb_field("parent", mb),
                mb_field("w_logprob", mb), mb_field("w_entropy", mb),
                ec.temperature, ec.loss_chunk,
                mode=resolve_loss_mode(ec, mc),
            )
            l_seed = live * l
            if mc.is_moe and mc.router_aux_coef:
                l_seed = l_seed + mc.router_aux_coef * valid * lb
            return (y, l_seed), (live * aux["sum_logprob"],
                                 live * aux["sum_entropy"], valid * lb)

        def tick(carry, t):
            (y_prev, dx_prev, stash, gacc, loss_acc, lp_acc, ent_acc,
             lb_acc) = carry

            # ---- forward: microbatch t − stage
            mf = t - stage
            valid_f = (mf >= 0) & (mf < M)
            x_in_f, y_f = stage_fwd(params, mf, y_prev)
            # slot S is a trash slot for bubble ticks (never read back)
            slot_f = jnp.where(valid_f, jnp.clip(mf, 0, M - 1) % S, S)
            stash = jax.lax.dynamic_update_index_in_dim(
                stash, x_in_f, slot_f, axis=0
            )

            # ---- backward: microbatch t − 2(pp−1) + stage
            mb = t - 2 * (pp - 1) + stage
            valid_b = (mb >= 0) & (mb < M)
            x_in_b = jax.lax.dynamic_index_in_dim(
                stash, jnp.clip(mb, 0, M - 1) % S, axis=0, keepdims=False
            )
            live = ((stage == pp - 1) & valid_b).astype(jnp.float32)
            valid = valid_b.astype(jnp.float32)
            (y_b, l_b), vjp_fn, (s_lp, s_ent, s_lb) = jax.vjp(
                lambda p, x: stage_out_fn(p, x, mb, live, valid),
                params, x_in_b, has_aux=True,
            )
            # downstream cotangent: from stage+1's bwd of mb last tick; the
            # last stage (and bubbles) seed zero — the loss cotangent is the
            # only source there
            dy = jnp.where(
                valid_b & (stage < pp - 1), dx_prev, jnp.zeros_like(dx_prev)
            )
            dp, dx = vjp_fn((dy.astype(y_b.dtype), jnp.float32(1.0)))
            gacc = jax.tree.map(
                lambda a, g: a + g.astype(jnp.float32), gacc, dp
            )
            loss_acc = loss_acc + l_b
            lp_acc = lp_acc + s_lp
            ent_acc = ent_acc + s_ent
            lb_acc = lb_acc + s_lb

            y_next = jax.lax.ppermute(y_f, "pipe", perm)
            dx_next = jax.lax.ppermute(dx, "pipe", perm_bwd)
            return (y_next, dx_next, stash, gacc, loss_acc, lp_acc, ent_acc,
                    lb_acc), None

        x0 = jnp.zeros((n, mc.hidden_size), dtype)
        stash0 = jnp.zeros((S + 1, n, mc.hidden_size), dtype)
        gacc0 = jax.tree.map(
            lambda p: jnp.zeros(p.shape, jnp.float32), params
        )
        carry = (x0, x0, stash0, gacc0,
                 jnp.float32(0), jnp.float32(0), jnp.float32(0),
                 jnp.float32(0))
        (_, _, _, gacc, loss, s_lp, s_ent, s_lb), _ = jax.lax.scan(
            tick, carry, jnp.arange(M + 2 * (pp - 1))
        )
        grads = jax.tree.map(lambda g, p: g.astype(p.dtype), gacc, params)
        aux = {"sum_logprob": s_lp, "sum_entropy": s_ent}
        if mc.is_moe:
            aux["lb_loss"] = s_lb
        # loss/aux live on the last stage only; layer grads are stage-local,
        # everything else (embed at stage 0 + loss head at pp−1, final_norm
        # at pp−1) is partial per stage → psum over "pipe"
        loss = jax.lax.psum(loss, "pipe")
        aux = jax.tree.map(lambda a: jax.lax.psum(a, "pipe"), aux)
        grads = {
            k: v if k == "layers" else jax.tree.map(
                lambda g: jax.lax.psum(g, "pipe"), v
            )
            for k, v in grads.items()
        }
        if mc.use_qk_norm:
            for nrm in ("q_norm", "k_norm"):
                grads["layers"][nrm] = jax.lax.psum(grads["layers"][nrm], "model")
        grads = jax.tree.map(lambda g: jax.lax.psum(g, "data"), grads)
        loss = jax.lax.psum(loss, "data")
        aux = jax.tree.map(lambda a: jax.lax.psum(a, "data"), aux)
        return loss, grads, aux

    def local_step(params, batch):
        stage = jax.lax.axis_index("pipe")
        toks = batch["tokens"][0]  # [M, n]
        M, n = toks.shape

        mb_field = make_mb_field(batch, M)

        def loss_fn(p):
            dtype = p["layers"]["wq"].dtype

            def tick(carry, t):
                x_prev, loss_acc, lp_acc, ent_acc, lb_acc = carry
                mb = t - stage
                tok = mb_field("tokens", mb)  # [n]
                dep = mb_field("depth", mb)
                attn_fn = make_attn_for(mb_field, mb)
                cos, sin = rope_tables(dep, mc.head_dim, mc.rope_theta,
                                       mc.rope_scaling_tuple)

                x0 = _embed_vp(p["embed"], tok, "model").astype(dtype)
                x_in = jnp.where(stage == 0, x0, x_prev)
                y, lb = stage_layers(
                    p, x_in, attn_fn, cos, sin, mb_field("valid", mb)
                )

                # last stage: final norm + loss on the microbatch leaving the
                # pipe this tick (masked to 0 on bubbles / other stages).
                # mpar_in: the vocab-parallel loss hands back per-rank PARTIAL
                # hidden cotangents (its vocab shard only) — psum them over
                # "model" (same operator as tp_model's final norm)
                h = mpar_in(rms_norm(y, p["final_norm"], mc.rms_norm_eps), "model")
                w_local = p["embed"].T if mc.tie_word_embeddings else p["lm_head"]
                l, aux = vp_tree_loss_from_hidden(
                    h, w_local, tok, mb_field("parent", mb),
                    mb_field("w_logprob", mb), mb_field("w_entropy", mb),
                    ec.temperature, ec.loss_chunk,
                    mode=resolve_loss_mode(ec, mc),
                )
                live = ((mb >= 0) & (mb < M) & (stage == pp - 1)).astype(l.dtype)
                # the router lb loss is per-STAGE (each stage's own MoE
                # layers), masked to real microbatches — the summed per-stage
                # seeds reproduce d(total)/dθ just like the CE mask below
                valid = ((mb >= 0) & (mb < M)).astype(l.dtype)
                loss_acc = loss_acc + live * l
                if mc.is_moe and mc.router_aux_coef:
                    loss_acc = loss_acc + mc.router_aux_coef * valid * lb
                lb_acc = lb_acc + valid * lb
                lp_acc = lp_acc + live * aux["sum_logprob"]
                ent_acc = ent_acc + live * aux["sum_entropy"]

                y = jax.lax.ppermute(y, "pipe", perm)
                return (y, loss_acc, lp_acc, ent_acc, lb_acc), None

            x0 = jnp.zeros((n, mc.hidden_size), dtype)
            carry = (x0, jnp.float32(0), jnp.float32(0), jnp.float32(0),
                     jnp.float32(0))
            (_, loss, s_lp, s_ent, s_lb), _ = jax.lax.scan(
                tick, carry, jnp.arange(M + pp - 1)
            )
            # NOTE: no psum here — each device's backward seeds its OWN loss
            # cotangent, so the per-stage masked loss (nonzero only on the
            # last stage, plus each stage's own lb term) makes the SPMD
            # backward compute d(true loss)/dθ; a psum inside loss_fn would
            # transpose to another psum and scale every gradient by pp (see
            # parallel/collectives.py).
            aux_out = {"sum_logprob": s_lp, "sum_entropy": s_ent}
            if mc.is_moe:
                aux_out["lb_loss"] = s_lb
            return loss, aux_out

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        # share the last stage's loss/aux with every stage (post-grad)
        loss = jax.lax.psum(loss, "pipe")
        aux = jax.tree.map(lambda a: jax.lax.psum(a, "pipe"), aux)
        # layer grads are stage-local (pipe-sharded); everything else is
        # touched by several stages (embed at 0 + loss head at pp−1,
        # final_norm at pp−1 with zeros elsewhere) → psum over "pipe"
        grads = {
            k: v if k == "layers" else jax.tree.map(
                lambda g: jax.lax.psum(g, "pipe"), v
            )
            for k, v in grads.items()
        }
        if mc.use_qk_norm:
            for nrm in ("q_norm", "k_norm"):
                grads["layers"][nrm] = jax.lax.psum(grads["layers"][nrm], "model")
        grads = jax.tree.map(lambda g: jax.lax.psum(g, "data"), grads)
        loss = jax.lax.psum(loss, "data")
        aux = jax.tree.map(lambda a: jax.lax.psum(a, "data"), aux)
        return loss, grads, aux

    local_fn = local_step_1f1b if schedule == "1f1b" else local_step

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(pspecs, bspec),
        out_specs=(P(), pspecs, P()),
        check_vma=False,
    )
    def step(params, batch):
        return local_fn(params, batch)

    grad_step = jax.jit(step)
    if optimizer is None:
        return grad_step

    import optax

    # donated + in-graph non-finite guard, matching train.py's opt_step
    # (donation aliases the update in place; callers always rebind)
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def opt_step(params, opt_state, batch):
        loss, grads, aux = step(params, batch)
        updates, new_state = optimizer.update(grads, opt_state, params)
        good = jnp.isfinite(loss)
        updates = jax.tree.map(
            lambda u: jnp.where(good, u, jnp.zeros_like(u)), updates
        )
        new_state = jax.tree.map(
            lambda nx, ox: jnp.where(good, nx, ox), new_state, opt_state
        )
        params = optax.apply_updates(params, updates)
        return params, new_state, loss, aux

    return opt_step
