"""Mesh-partitioned Pallas qbits matmul (custom_partitioning wrapper).

Round 1 disabled Pallas kernels whenever a Mesh was active because a raw
pallas_call has no partitioning rule (XLA would all-gather its operands).
`ops/pallas/qbits_mm_sharded.py` fixes that: these tests check each weight
sharding case computes correctly per-shard (interpret mode on the CPU mesh)
and that the compiled HLO contains NO all-gather of the packed payload.
"""

import re

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import nnx
from jax.sharding import NamedSharding, PartitionSpec as P

import quanto_tpu as qt
from quanto_tpu.models import LlamaConfig, LlamaForCausalLM
from quanto_tpu.ops import config as ops_config
from quanto_tpu.ops.pallas.qbits_mm_sharded import qbits_mm_partitioned
from quanto_tpu.parallel import LLAMA_TP_RULES, make_mesh, shard_model
from quanto_tpu.tensor.weights import WeightQBitsTpuArray


@pytest.fixture
def qweight():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(512, 2048), jnp.float32)
    scale, shift = qt.MaxOptimizer()(w, qt.qint4, axis=0, group_size=128)
    return qt.quantize_weight(w, qt.qint4, 0, scale, shift=shift, group_size=128)


@pytest.mark.parametrize(
    "case,k_shards,pspec,sspec",
    [
        ("col", 1, P("tp", None), P(None, "tp")),
        ("row", 4, P(None, "tp"), P("tp", None)),
        ("repl", 1, P(None, None), P(None, None)),
    ],
)
def test_partitioned_qbits_mm(qweight, case, k_shards, pspec, sspec):
    mesh = make_mesh({"dp": 2, "tp": 4})
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(16, 2048), jnp.float32)
    ref = np.asarray(x, np.float64) @ np.asarray(qweight.dequantize(), np.float64).T

    tpu = WeightQBitsTpuArray.from_generic(qweight, k_shards=k_shards)
    packed = jax.device_put(tpu._packed, NamedSharding(mesh, pspec))
    sc = jax.device_put(tpu._scale_t, NamedSharding(mesh, sspec))
    sh = jax.device_put(tpu._shift_t, NamedSharding(mesh, sspec))
    xs = jax.device_put(x, NamedSharding(mesh, P("dp", None)))
    fn = jax.jit(
        lambda a, b, c, d: qbits_mm_partitioned(
            a, b, c, d, 4, 128, k_shards=k_shards, interpret=True
        )
    )
    with mesh:
        out = fn(xs, packed, sc, sh)
        hlo = fn.lower(xs, packed, sc, sh).compile().as_text()
    err = np.abs(np.asarray(out) - ref).max() / np.abs(ref).max()
    assert err < 5e-3, (case, err)
    # The packed payload must never be gathered.
    assert "all-gather" not in hlo, case
    if case == "row":
        assert len(re.findall(r"all-reduce", hlo)) >= 1  # the psum


def test_model_forward_partitioned_pallas_matches_single_device():
    """Full int4 llama forward with Pallas FORCED ON under a dp x tp mesh:
    the partitioned kernels must reproduce the single-device output."""
    cfg = LlamaConfig(
        vocab_size=128, hidden_size=1024, intermediate_size=1024,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
        max_position_embeddings=64, dtype=jnp.float32,
    )
    model = LlamaForCausalLM(cfg, rngs=nnx.Rngs(0))
    ids = jnp.asarray(np.array([[1, 5, 17, 99, 3, 42, 7, 88]], dtype=np.int64))
    qt.quantize(model, weights="qint4", exclude="lm_head")
    ops_config.set_backend(pallas_qbits=True)
    try:
        qt.freeze(model)
        ref, _ = model(ids)
        mesh = make_mesh({"dp": 2, "tp": 4})
        shard_model(model, mesh, LLAMA_TP_RULES)
        graphdef, state = nnx.split(model)
        fwd = jax.jit(lambda st, i: nnx.merge(graphdef, st)(i)[0])
        with mesh:
            out = fwd(state, ids)
            hlo = fwd.lower(state, ids).compile().as_text()
    finally:
        ops_config.set_backend()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=5e-4, atol=5e-4)
    assert "all-gather" not in hlo


def test_w4a8_qlinear_partitioned_under_mesh():
    """The qlinear W4A8 branch routes through the partitioned wrapper under
    an active mesh: int8-activation x int4-weight output matches the
    unsharded dequant oracle, payload stays sharded."""
    from quanto_tpu.ops.qlinear import qlinear
    from quanto_tpu.tensor.activations import quantize_activation
    from quanto_tpu.tensor.optimizers import MaxOptimizer
    from quanto_tpu.tensor.qtype import qint4, qint8
    from quanto_tpu.tensor.weights import quantize_weight

    rng = np.random.RandomState(3)
    w = jnp.asarray(rng.randn(512, 2048), jnp.float32)
    x = jnp.asarray(rng.randn(8, 2048), jnp.float32)
    scale, shift = MaxOptimizer()(w, qint4, axis=0, group_size=128)
    qw = quantize_weight(w, qint4, 0, scale, shift=shift, group_size=128)
    qx = quantize_activation(x, qint8, jnp.float32(np.abs(np.asarray(x)).max() / 127.0))
    oracle = np.asarray(qx.dequantize() @ qw.dequantize().T, np.float64)

    mesh = make_mesh({"dp": 2, "tp": 4})
    for k_shards, pspec, sspec in [(1, P("tp", None), P(None, "tp")),
                                   (4, P(None, "tp"), P("tp", None))]:
        tpu = WeightQBitsTpuArray.from_generic(qw, k_shards=k_shards)
        sharded = WeightQBitsTpuArray(
            _packed=jax.device_put(tpu._packed, NamedSharding(mesh, pspec)),
            _scale_t=jax.device_put(tpu._scale_t, NamedSharding(mesh, sspec)),
            _shift_t=jax.device_put(tpu._shift_t, NamedSharding(mesh, sspec)),
            qtype=tpu.qtype, group_size=tpu.group_size,
            orig_shape=tpu.orig_shape, float_dtype=tpu.float_dtype,
            k_shards=k_shards,
        )
        ops_config.set_backend(pallas_qbits=True)
        try:
            fn = jax.jit(lambda a, b: qlinear(a, b))
            with mesh:
                out = fn(qx, sharded)
                hlo = fn.lower(qx, sharded).compile().as_text()
        finally:
            ops_config.set_backend()
        err = np.abs(np.asarray(out, np.float64) - oracle).max() / np.abs(oracle).max()
        assert err < 1e-3, (k_shards, err)
        assert "all-gather" not in hlo
