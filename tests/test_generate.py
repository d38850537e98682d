"""KV-cache sampler vs HF transformers generate (greedy parity).

The reference delegates rollouts to its host framework; this sampler makes
the build self-contained — the oracle is HF's own generate() on the same
weights."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamictreeattn_tpu.models import MODEL_CONFIGS, init_params
from dynamictreeattn_tpu.models.generate import generate
from dynamictreeattn_tpu.models.hf_compat import hf_config, to_hf_state_dict


def _hf_model(cfg, params):
    import torch

    hfc = hf_config(cfg)
    if cfg.is_moe:
        from transformers.models.qwen3_moe import Qwen3MoeForCausalLM as M
    elif cfg.use_qk_norm:
        from transformers.models.qwen3 import Qwen3ForCausalLM as M
    elif not cfg.attention_bias:
        from transformers.models.llama import LlamaForCausalLM as M
    else:
        from transformers.models.qwen2 import Qwen2ForCausalLM as M
    m = M(hfc).eval()
    sd = {k: torch.from_numpy(np.array(v))
          for k, v in to_hf_state_dict(params, cfg).items()}
    missing, unexpected = m.load_state_dict(sd, strict=False)
    assert not [x for x in missing if "rotary" not in x], missing
    assert not unexpected, unexpected
    return m


@pytest.mark.parametrize("name", ["qwen3-tiny", "llama-tiny"])
def test_greedy_generate_matches_hf(name):
    import torch

    cfg = MODEL_CONFIGS[name]
    params = init_params(cfg, jax.random.key(3), dtype=jnp.float32)
    hf = _hf_model(cfg, params)

    rng = np.random.default_rng(0)
    lens = np.array([9, 13, 6], np.int32)
    Lp = int(lens.max())
    prompts = np.zeros((3, Lp), np.int32)
    for b, L in enumerate(lens):
        prompts[b, :L] = rng.integers(1, cfg.vocab_size, size=L)

    max_new = 8
    ours = generate(params, cfg, prompts, lens, max_new, greedy=True)

    for b, L in enumerate(lens):
        inp = torch.from_numpy(prompts[b:b + 1, :L].astype(np.int64))
        with torch.no_grad():
            out = hf.generate(
                inp, max_new_tokens=max_new, do_sample=False,
                pad_token_id=0,
            )[0, L:].numpy()
        np.testing.assert_array_equal(ours[b], out.astype(np.int32), err_msg=name)


def test_batched_generate_matches_single():
    """Right-padded batch rows must sample exactly like solo runs (greedy)."""
    cfg = MODEL_CONFIGS["qwen3-tiny"]
    params = init_params(cfg, jax.random.key(4), dtype=jnp.float32)
    rng = np.random.default_rng(1)
    lens = np.array([7, 12], np.int32)
    Lp = int(lens.max())
    prompts = np.zeros((2, Lp), np.int32)
    for b, L in enumerate(lens):
        prompts[b, :L] = rng.integers(1, cfg.vocab_size, size=L)

    both = generate(params, cfg, prompts, lens, 6, greedy=True)
    for b, L in enumerate(lens):
        solo = generate(
            params, cfg, prompts[b:b + 1, :L], lens[b:b + 1], 6, greedy=True
        )
        np.testing.assert_array_equal(both[b], solo[0])


def test_eos_forces_tail():
    """Every token after a sampled eos is eos (truncation contract)."""
    cfg = MODEL_CONFIGS["qwen3-tiny"]
    params = init_params(cfg, jax.random.key(5), dtype=jnp.float32)
    rng = np.random.default_rng(2)
    prompts = rng.integers(1, cfg.vocab_size, size=(4, 8)).astype(np.int32)
    lens = np.full((4,), 8, np.int32)
    # greedy run without eos to find a token that actually appears
    free = generate(params, cfg, prompts, lens, 12, greedy=True)
    eos = int(free[0, 3])
    out = generate(params, cfg, prompts, lens, 12, greedy=True, eos_id=eos)
    for b in range(4):
        hits = np.nonzero(out[b] == eos)[0]
        if len(hits):
            assert np.all(out[b, hits[0]:] == eos), out[b]


def test_generate_shards_over_data_axis():
    """Sharded prompt rows (fake 8-device mesh): GSPMD partitions the batched
    sampler — results identical to the unsharded run (rollout scale-out)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dynamictreeattn_tpu.parallel import make_mesh

    cfg = MODEL_CONFIGS["qwen3-tiny"]
    params = init_params(cfg, jax.random.key(7), dtype=jnp.float32)
    rng = np.random.default_rng(3)
    B, Lp = 8, 8
    prompts = rng.integers(1, cfg.vocab_size, size=(B, Lp)).astype(np.int32)
    lens = np.full((B,), Lp, np.int32)

    ref = generate(params, cfg, prompts, lens, 6, greedy=True)

    mesh = make_mesh(dp=8)
    p_sh = jax.device_put(prompts, NamedSharding(mesh, P("data", None)))
    l_sh = jax.device_put(lens, NamedSharding(mesh, P("data")))
    out = generate(params, cfg, p_sh, l_sh, 6, greedy=True)
    np.testing.assert_array_equal(out, ref)


# ---------------------------------------------------------- grouped sampling


@pytest.mark.parametrize("name", ["qwen3-tiny", "llama-tiny", "qwen3-moe-tiny"])
def test_grouped_greedy_matches_flat(name):
    """generate_grouped must be token-for-token the flat sampler on the
    duplicated-prompt batch: greedy makes all G branches identical and equal
    to the flat row (covers qk-norm, no-qk-norm, and MoE routing parity)."""
    from dynamictreeattn_tpu.models.generate import generate_grouped

    cfg = MODEL_CONFIGS[name]
    params = init_params(cfg, jax.random.key(11), dtype=jnp.float32)
    rng = np.random.default_rng(8)
    lens = np.array([9, 6], np.int32)  # ragged: padding slots must stay masked
    Lp = int(lens.max())
    prompts = np.zeros((2, Lp), np.int32)
    for b, L in enumerate(lens):
        prompts[b, :L] = rng.integers(1, cfg.vocab_size, size=L)

    max_new, G = 7, 3
    flat = generate(params, cfg, prompts, lens, max_new, greedy=True)
    grouped = generate_grouped(params, cfg, prompts, lens, G, max_new,
                               greedy=True)
    assert grouped.shape == (2, G, max_new)
    for p in range(2):
        for g in range(G):
            np.testing.assert_array_equal(grouped[p, g], flat[p], err_msg=name)


def test_grouped_eos_forces_tail():
    from dynamictreeattn_tpu.models.generate import generate_grouped

    cfg = MODEL_CONFIGS["qwen3-tiny"]
    params = init_params(cfg, jax.random.key(12), dtype=jnp.float32)
    rng = np.random.default_rng(9)
    prompts = rng.integers(1, cfg.vocab_size, size=(2, 8)).astype(np.int32)
    lens = np.full((2,), 8, np.int32)
    free = generate_grouped(params, cfg, prompts, lens, 4, 10,
                            key=jax.random.key(0), temperature=1.0)
    eos = int(free[0, 0, 2])
    out = generate_grouped(params, cfg, prompts, lens, 4, 10,
                           key=jax.random.key(0), temperature=1.0, eos_id=eos)
    for p in range(2):
        for g in range(4):
            hits = np.nonzero(out[p, g] == eos)[0]
            if len(hits):
                assert np.all(out[p, g, hits[0]:] == eos), out[p, g]


def test_grouped_sampling_branches_diverge():
    """Temperature sampling must draw independent tokens per branch (the
    whole point of G samples per prompt)."""
    from dynamictreeattn_tpu.models.generate import generate_grouped

    cfg = MODEL_CONFIGS["qwen3-tiny"]
    params = init_params(cfg, jax.random.key(13), dtype=jnp.float32)
    rng = np.random.default_rng(10)
    prompts = rng.integers(1, cfg.vocab_size, size=(1, 8)).astype(np.int32)
    lens = np.full((1,), 8, np.int32)
    out = generate_grouped(params, cfg, prompts, lens, 8, 12,
                           key=jax.random.key(1), temperature=1.0)
    rows = {tuple(out[0, g]) for g in range(8)}
    assert len(rows) > 1  # astronomically unlikely to collide at temp 1.0


def test_grouped_generate_shards_over_data_axis():
    """Prompt rows sharded over "data": GSPMD partitions the grouped sampler
    (prompt cache [L, P, ...] and branch caches [L, P, G, ...] both shard on
    P) — results identical to the unsharded run."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dynamictreeattn_tpu.models.generate import generate_grouped
    from dynamictreeattn_tpu.parallel import make_mesh

    cfg = MODEL_CONFIGS["qwen3-tiny"]
    params = init_params(cfg, jax.random.key(14), dtype=jnp.float32)
    rng = np.random.default_rng(11)
    Pn, Lp = 8, 8
    prompts = rng.integers(1, cfg.vocab_size, size=(Pn, Lp)).astype(np.int32)
    lens = np.full((Pn,), Lp, np.int32)

    ref = generate_grouped(params, cfg, prompts, lens, 2, 6, greedy=True)

    mesh = make_mesh(dp=8)
    p_sh = jax.device_put(prompts, NamedSharding(mesh, P("data", None)))
    l_sh = jax.device_put(lens, NamedSharding(mesh, P("data")))
    out = generate_grouped(params, cfg, p_sh, l_sh, 2, 6, greedy=True)
    np.testing.assert_array_equal(out, ref)


def test_eos_mode_matches_free_run_prefix():
    """eos mode (early-exit while_loop) must equal the free-running sampler
    token-for-token up to and including each row's first eos, and be all-eos
    after — i.e., early exit changes nothing observable."""
    cfg = MODEL_CONFIGS["qwen3-tiny"]
    params = init_params(cfg, jax.random.key(21), dtype=jnp.float32)
    rng = np.random.default_rng(20)
    prompts = rng.integers(1, cfg.vocab_size, size=(4, 8)).astype(np.int32)
    lens = np.full((4,), 8, np.int32)
    free = generate(params, cfg, prompts, lens, 12, greedy=True)
    eos = int(free[0, 3])  # a token that actually appears → rows finish early
    out = generate(params, cfg, prompts, lens, 12, greedy=True, eos_id=eos)
    for b in range(4):
        hits = np.nonzero(free[b] == eos)[0]
        cut = (hits[0] + 1) if len(hits) else 12
        np.testing.assert_array_equal(out[b, :cut], free[b, :cut])
        assert np.all(out[b, cut:] == eos)


def test_grouped_eos_mode_matches_free_run_prefix():
    from dynamictreeattn_tpu.models.generate import generate_grouped

    cfg = MODEL_CONFIGS["qwen3-tiny"]
    params = init_params(cfg, jax.random.key(22), dtype=jnp.float32)
    rng = np.random.default_rng(21)
    prompts = rng.integers(1, cfg.vocab_size, size=(2, 8)).astype(np.int32)
    lens = np.full((2,), 8, np.int32)
    kk = jax.random.key(3)
    free = generate_grouped(params, cfg, prompts, lens, 4, 12, key=kk,
                            temperature=1.0)
    eos = int(free[0, 0, 2])
    out = generate_grouped(params, cfg, prompts, lens, 4, 12, key=kk,
                           temperature=1.0, eos_id=eos)
    for p in range(2):
        for g in range(4):
            hits = np.nonzero(free[p, g] == eos)[0]
            cut = (hits[0] + 1) if len(hits) else 12
            np.testing.assert_array_equal(out[p, g, :cut], free[p, g, :cut])
            assert np.all(out[p, g, cut:] == eos)


@pytest.mark.skipif(
    not os.environ.get("RUN_INTERPRET"),
    reason="Pallas interpret-mode compile is slow; opt in with RUN_INTERPRET=1. "
    "Real-kernel parity runs on TPU via scripts/tpu_generate_ab.py.",
)
@pytest.mark.parametrize("t", [0, 1, 100, 255])
def test_decode_attention_kernel_matches_oracle(t):
    """ops/decode_attention.py vs the concatenated-softmax oracle at several
    decode positions (t=0: empty branch caches — all chunks skipped)."""
    from dynamictreeattn_tpu.ops.decode_attention import (
        decode_attention_grouped,
    )

    def oracle(q, k_self, v_self, kp, vp, kc, vc, plens, t, scale):
        P, G, hq, dh = q.shape
        hkv, Lp = kp.shape[1], kp.shape[2]
        Nc = kc.shape[3]
        grp = hq // hkv
        qh = q.reshape(P, G, hkv, grp, dh)
        st_p = jnp.einsum("pgkrd,pkjd->pgkrj", qh, kp) * scale
        st_p = jnp.where(
            jnp.arange(Lp) < plens[:, None, None, None, None], st_p, -1e30
        )
        st_c = jnp.einsum("pgkrd,pgkjd->pgkrj", qh, kc) * scale
        st_c = jnp.where(jnp.arange(Nc) < t, st_c, -1e30)
        st_s = jnp.einsum("pgkrd,pgkd->pgkr", qh, k_self) * scale
        st = jnp.concatenate([st_p, st_c, st_s[..., None]], axis=-1)
        p = jax.nn.softmax(st, axis=-1)
        o = (jnp.einsum("pgkrj,pkjd->pgkrd", p[..., :Lp], vp)
             + jnp.einsum("pgkrj,pgkjd->pgkrd", p[..., Lp:Lp + Nc], vc)
             + p[..., -1:] * v_self[:, :, :, None, :])
        return o.reshape(P, G, hq, dh)

    P, G, hq, hkv, dh = 2, 4, 4, 2, 128
    Lp, Nc = 512, 256
    ks = jax.random.split(jax.random.key(0), 7)
    f32 = jnp.float32
    q = jax.random.normal(ks[0], (P, G, hq, dh), f32)
    k_self = jax.random.normal(ks[1], (P, G, hkv, dh), f32)
    v_self = jax.random.normal(ks[2], (P, G, hkv, dh), f32)
    kp = jax.random.normal(ks[3], (P, hkv, Lp, dh), f32)
    vp = jax.random.normal(ks[4], (P, hkv, Lp, dh), f32)
    kc = jax.random.normal(ks[5], (P, G, hkv, Nc, dh), f32)
    vc = jax.random.normal(ks[6], (P, G, hkv, Nc, dh), f32)
    plens = jnp.array([300, 512], jnp.int32)
    with jax.default_matmul_precision("highest"):
        got = decode_attention_grouped(
            q, k_self, v_self, kp, vp, kc, vc, plens, jnp.int32(t),
            prompt_chunk=256, branch_chunk=128, interpret=True,
        )
        want = oracle(q, k_self, v_self, kp, vp, kc, vc, plens, t, dh ** -0.5)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )
