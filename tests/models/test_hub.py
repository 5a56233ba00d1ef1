"""Hub-shaped model resolution + sharded save (reference ModelHubMixin
surface, `optimum/quanto/models/transformers_models.py:20,114-179`; staged
hub tests `tests/models/conftest.py:6-27`). Offline: a fake HF cache layout
stands in for the hub."""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest
from flax import nnx

import quanto_tpu as qt
from quanto_tpu.models import (
    LlamaConfig,
    LlamaForCausalLM,
    QuantizedModelForCausalLM,
)
from quanto_tpu.models.hub import is_hub_id, resolve_model_path, set_hub_resolver
from quanto_tpu.utils.safetensors_io import save_sharded, load_file


def test_is_hub_id(tmp_path):
    assert is_hub_id("meta-llama/Meta-Llama-3.1-8B")
    assert not is_hub_id(str(tmp_path))
    assert not is_hub_id("./local/dir")
    assert not is_hub_id("/abs/path")
    assert not is_hub_id("no-slash-name")
    assert not is_hub_id("a/b/c")


def _save_tiny_quantized(directory):
    config = LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=32, dtype=jnp.float32,
    )
    model = LlamaForCausalLM(config, rngs=nnx.Rngs(0))
    qmodel = QuantizedModelForCausalLM.quantize(model, weights="qint8", exclude="lm_head")
    qmodel.save_pretrained(directory)
    return qmodel


def test_from_pretrained_hub_id_via_fake_cache(tmp_path, monkeypatch):
    """A hub id resolves through the standard HF cache layout with zero
    network (the pre-downloaded-model deployment path)."""
    commit = "abc123def"
    snap = tmp_path / "cache" / "models--test-org--tiny-llama" / "snapshots" / commit
    snap.mkdir(parents=True)
    (tmp_path / "cache" / "models--test-org--tiny-llama" / "refs").mkdir()
    (tmp_path / "cache" / "models--test-org--tiny-llama" / "refs" / "main").write_text(commit)
    ref = _save_tiny_quantized(str(snap))
    monkeypatch.setenv("QUANTO_TPU_HF_CACHE", str(tmp_path / "cache"))
    monkeypatch.setenv("QUANTO_TPU_OFFLINE", "1")

    assert resolve_model_path("test-org/tiny-llama") == str(snap)
    assert resolve_model_path("test-org/tiny-llama", revision="main") == str(snap)
    assert resolve_model_path("test-org/tiny-llama", revision="abc1") == str(snap)

    reloaded = QuantizedModelForCausalLM.from_pretrained(
        "test-org/tiny-llama", dtype=jnp.float32
    )
    ids = jnp.asarray(np.array([[1, 5, 9, 3]], dtype=np.int64))
    np.testing.assert_allclose(
        np.asarray(reloaded(ids)[0]), np.asarray(ref(ids)[0]), rtol=1e-5, atol=1e-5
    )


def test_default_revision_follows_refs_main(tmp_path, monkeypatch):
    """With multiple cached revisions, revision=None must resolve through
    the refs/main default-branch pointer (like huggingface_hub), not the
    newest snapshot by mtime — a stale side-branch snapshot touched later
    must not shadow the default branch."""
    repo = tmp_path / "cache" / "models--test-org--tiny-llama"
    main_commit, branch_commit = "aaa111", "bbb222"
    main_snap = repo / "snapshots" / main_commit
    branch_snap = repo / "snapshots" / branch_commit
    main_snap.mkdir(parents=True)
    branch_snap.mkdir(parents=True)
    (repo / "refs").mkdir()
    (repo / "refs" / "main").write_text(main_commit)
    (repo / "refs" / "dev").write_text(branch_commit)
    _save_tiny_quantized(str(main_snap))
    _save_tiny_quantized(str(branch_snap))
    # Make the non-default branch strictly newer by mtime.
    newer = os.path.getmtime(str(main_snap)) + 1000
    os.utime(str(branch_snap), (newer, newer))
    monkeypatch.setenv("QUANTO_TPU_HF_CACHE", str(tmp_path / "cache"))
    monkeypatch.setenv("QUANTO_TPU_OFFLINE", "1")

    assert resolve_model_path("test-org/tiny-llama") == str(main_snap)
    assert resolve_model_path("test-org/tiny-llama", revision="dev") == str(branch_snap)


def test_refs_main_incomplete_falls_back_to_newest(tmp_path, monkeypatch):
    """A dangling/incomplete refs/main snapshot falls back to the newest
    complete snapshot instead of failing resolution."""
    repo = tmp_path / "cache" / "models--test-org--tiny-llama"
    good = repo / "snapshots" / "good999"
    good.mkdir(parents=True)
    (repo / "refs").mkdir()
    (repo / "refs" / "main").write_text("gone000")  # snapshot never written
    _save_tiny_quantized(str(good))
    monkeypatch.setenv("QUANTO_TPU_HF_CACHE", str(tmp_path / "cache"))
    monkeypatch.setenv("QUANTO_TPU_OFFLINE", "1")

    assert resolve_model_path("test-org/tiny-llama") == str(good)


def test_offline_miss_gives_clean_error(tmp_path, monkeypatch):
    monkeypatch.setenv("QUANTO_TPU_HF_CACHE", str(tmp_path / "empty-cache"))
    monkeypatch.setenv("QUANTO_TPU_OFFLINE", "1")
    with pytest.raises(FileNotFoundError, match="offline"):
        resolve_model_path("nosuch-org/nosuch-model")


def test_custom_resolver(tmp_path, monkeypatch):
    target = tmp_path / "resolved"
    target.mkdir()
    _save_tiny_quantized(str(target))
    calls = {}

    def resolver(model_id, revision=None):
        calls["id"] = (model_id, revision)
        return str(target)

    set_hub_resolver(resolver)
    try:
        path = resolve_model_path("any-org/any-model", revision="r1")
    finally:
        set_hub_resolver(None)
    assert path == str(target)
    assert calls["id"] == ("any-org/any-model", "r1")


def test_sharded_save_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    tensors = {f"layer{i}.weight": rng.randn(64, 64).astype(np.float32) for i in range(6)}
    # 16 KB per tensor, 40 KB shard limit -> 3 shards of 2.
    save_sharded(tensors, str(tmp_path), max_shard_size=40 * 1024)
    index_path = tmp_path / "model.safetensors.index.json"
    assert index_path.exists()
    index = json.loads(index_path.read_text())
    assert len(set(index["weight_map"].values())) == 3
    assert index["metadata"]["total_size"] == 6 * 64 * 64 * 4
    merged = {}
    for fname in set(index["weight_map"].values()):
        merged.update(load_file(str(tmp_path / fname)))
    for k, v in tensors.items():
        np.testing.assert_array_equal(np.asarray(merged[k]), v)
    # Below the limit: back to a single file, stale index removed.
    save_sharded(tensors, str(tmp_path), max_shard_size="5GB")
    assert (tmp_path / "model.safetensors").exists()
    assert not index_path.exists()


def test_sharded_save_pretrained_reloads(tmp_path):
    """save_pretrained with a tiny shard limit produces a sharded checkpoint
    that from_pretrained reads back (lazy shard loader)."""
    d = str(tmp_path / "model")
    config = LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=32, dtype=jnp.float32,
    )
    model = LlamaForCausalLM(config, rngs=nnx.Rngs(0))
    qmodel = QuantizedModelForCausalLM.quantize(model, weights="qint8", exclude="lm_head")
    qmodel.save_pretrained(d, max_shard_size=16 * 1024)
    assert os.path.exists(os.path.join(d, "model.safetensors.index.json"))
    assert not os.path.exists(os.path.join(d, "model.safetensors"))
    reloaded = QuantizedModelForCausalLM.from_pretrained(d, dtype=jnp.float32)
    ids = jnp.asarray(np.array([[2, 7, 11]], dtype=np.int64))
    np.testing.assert_allclose(
        np.asarray(reloaded(ids)[0]), np.asarray(qmodel(ids)[0]), rtol=1e-5, atol=1e-5
    )


def test_push_to_hub_offline_error(tmp_path, monkeypatch):
    monkeypatch.setenv("QUANTO_TPU_OFFLINE", "1")
    qmodel = _save_tiny_quantized(str(tmp_path / "m"))
    with pytest.raises(RuntimeError, match="offline"):
        qmodel.save_pretrained(str(tmp_path / "m2"), push_to_hub=True, repo_id="org/m")
    with pytest.raises(ValueError, match="repo_id"):
        qmodel.save_pretrained(str(tmp_path / "m3"), push_to_hub=True)


def test_diffusers_sharded_save_roundtrip(tmp_path):
    """Diffusers wrapper save_pretrained shards above max_shard_size and
    from_pretrained reads the index back."""
    from quanto_tpu.models import QuantizedPixArtTransformer2DModel
    from quanto_tpu.models.pixart import PixArtConfig, PixArtTransformer2DModel

    cfg = PixArtConfig(
        num_layers=1, num_attention_heads=2, attention_head_dim=16,
        in_channels=4, sample_size=8, cross_attention_dim=32,
        caption_channels=32, dtype=jnp.float32,
    )
    m = PixArtTransformer2DModel(cfg, rngs=nnx.Rngs(0))
    q = QuantizedPixArtTransformer2DModel.quantize(m, weights="qint8")
    d = str(tmp_path / "px")
    q.save_pretrained(d, max_shard_size=8 * 1024)
    assert os.path.exists(os.path.join(d, "model.safetensors.index.json"))
    r = QuantizedPixArtTransformer2DModel.from_pretrained(d, dtype=jnp.float32)
    rng = np.random.RandomState(0)
    latent = jnp.asarray(rng.randn(1, 8, 8, 4), jnp.float32)
    t = jnp.asarray([5], jnp.int32)
    ctx = jnp.asarray(rng.randn(1, 3, 32), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(r(latent, t, ctx)), np.asarray(q(latent, t, ctx)),
        rtol=1e-5, atol=1e-5,
    )


def test_synth_config_preserves_kwargs_consumed_fields(tmp_path):
    """Fields some HF configs consume via **kwargs (not __init__ params)
    must survive the save/reload roundtrip: head_dim (Qwen3Moe),
    tie_word_embeddings (OPT/Starcoder2/T5/...), decoder_start_token_id
    (T5). Losing them silently changes weight shapes or tying on reload."""
    import transformers

    from quanto_tpu.models.transformers_models import _synthesize_hf_config
    from quanto_tpu.models.qwen3 import Qwen3MoeConfig, Qwen3MoeForCausalLM
    from quanto_tpu.models.t5 import T5Config, T5ForConditionalGeneration
    from quanto_tpu.models.opt import OPTConfig, OPTForCausalLM

    q3 = Qwen3MoeForCausalLM(
        Qwen3MoeConfig(
            vocab_size=64, hidden_size=32, intermediate_size=64,
            num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=2,
            head_dim=16, num_experts=2, num_experts_per_tok=1,
            moe_intermediate_size=32, dtype=jnp.float32,
        ),
        rngs=nnx.Rngs(0),
    )
    hf = _synthesize_hf_config(q3)
    assert hf.head_dim == 16
    assert Qwen3MoeConfig.from_hf(hf, dtype=jnp.float32).head_dim == 16

    t5 = T5ForConditionalGeneration(
        T5Config(
            vocab_size=64, d_model=32, d_kv=8, d_ff=64, num_layers=1,
            num_heads=4, relative_attention_num_buckets=8,
            relative_attention_max_distance=16, decoder_start_token_id=0,
            tie_word_embeddings=False, dtype=jnp.float32,
        ),
        rngs=nnx.Rngs(0),
    )
    hf = _synthesize_hf_config(t5)
    assert hf.decoder_start_token_id == 0
    assert hf.tie_word_embeddings is False

    opt = OPTForCausalLM(
        OPTConfig(
            vocab_size=64, hidden_size=32, ffn_dim=64, num_hidden_layers=1,
            num_attention_heads=4, max_position_embeddings=32,
            tie_word_embeddings=False, dtype=jnp.float32,
        ),
        rngs=nnx.Rngs(0),
    )
    assert _synthesize_hf_config(opt).tie_word_embeddings is False
