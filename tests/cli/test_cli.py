"""CLI tests (reference `tests/cli/test_quantize_cli.py:26-50`): quantize a
tiny local checkpoint via the CLI entry point, reload, verify the qmap."""

import json
import os
import tempfile

import numpy as np
import jax.numpy as jnp
import pytest

from quanto_tpu.cli import main as cli_main
from quanto_tpu.models import (
    LlamaConfig,
    LlamaForCausalLM,
    QuantizedModelForCausalLM,
)
from quanto_tpu.models.loading import hf_state_dict
from quanto_tpu.utils.safetensors_io import save_file


def _write_float_checkpoint(directory):
    from transformers import LlamaConfig as HFLlamaConfig

    hf_config = HFLlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64,
    )
    model = LlamaForCausalLM(LlamaConfig.from_hf(hf_config, dtype=jnp.float32))
    hf_config.save_pretrained(directory)
    save_file(hf_state_dict(model), os.path.join(directory, "model.safetensors"))
    return model


def test_cli_quantize_and_reload(capsys):
    with tempfile.TemporaryDirectory() as src, tempfile.TemporaryDirectory() as dst:
        model = _write_float_checkpoint(src)
        rc = cli_main([
            "quantize", dst, "-m", src, "--weights", "int8",
            "--dtype", "fp32", "--exclude", "lm_head",
        ])
        assert rc == 0
        with open(os.path.join(dst, "quanto_qmap.json")) as f:
            qmap = json.load(f)
        assert qmap["model.layers.0.self_attn.q_proj"]["weights"] == "qint8"
        assert "lm_head" not in qmap
        reloaded = QuantizedModelForCausalLM.from_pretrained(dst, dtype=jnp.float32)
        ids = jnp.asarray(np.array([[1, 5, 17]], dtype=np.int64))
        ref, _ = model(ids)
        out, _ = reloaded(ids)
        # int8-weight logits stay close to the float model.
        a, b = np.asarray(out).ravel(), np.asarray(ref).ravel()
        cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
        assert cos > 0.99

        rc = cli_main(["inspect", dst])
        assert rc == 0
        captured = capsys.readouterr().out
        assert "quantized modules:" in captured
        assert "I8" in captured


def test_cli_quantize_t5(capsys):
    """Seq2seq checkpoints route through QuantizedModelForSeq2SeqLM."""
    from transformers import T5Config as HFT5Config

    from quanto_tpu.models import QuantizedModelForSeq2SeqLM, T5Config, T5ForConditionalGeneration

    with tempfile.TemporaryDirectory() as src, tempfile.TemporaryDirectory() as dst:
        hf_config = HFT5Config(
            vocab_size=96, d_model=48, d_kv=12, d_ff=96, num_layers=2,
            num_heads=4, relative_attention_num_buckets=8,
            decoder_start_token_id=0,
        )
        model = T5ForConditionalGeneration(T5Config.from_hf(hf_config, dtype=jnp.float32))
        hf_config.save_pretrained(src)
        save_file(hf_state_dict(model), os.path.join(src, "model.safetensors"))
        rc = cli_main([
            "quantize", dst, "-m", src, "--weights", "int8", "--dtype", "fp32",
        ])
        assert rc == 0
        with open(os.path.join(dst, "quanto_qmap.json")) as f:
            qmap = json.load(f)
        assert qmap["encoder.block.0.layer.0.SelfAttention.q"]["weights"] == "qint8"
        reloaded = QuantizedModelForSeq2SeqLM.from_pretrained(dst, dtype=jnp.float32)
        enc_ids = jnp.asarray(np.array([[1, 5, 17, 9]], dtype=np.int64))
        dec_ids = jnp.asarray(np.array([[0, 3]], dtype=np.int64))
        ref, _ = model(dec_ids, encoder_input_ids=enc_ids)
        out, _ = reloaded(dec_ids, encoder_input_ids=enc_ids)
        a, b = np.asarray(out).ravel(), np.asarray(ref).ravel()
        cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
        assert cos > 0.99


def test_cli_hub_id_and_parity_flags(monkeypatch, tmp_path):
    """Reference-CLI parity (`subpackage/commands/quantize.py:33-88`):
    -m accepts a hub id (resolved via the offline cache), --revision picks
    the snapshot, --dtype auto reads torch_dtype from config.json, and
    --trust-remote-code/--task are accepted."""
    commit = "deadbeef01"
    repo = tmp_path / "cache" / "models--org--tiny" 
    snap = repo / "snapshots" / commit
    snap.mkdir(parents=True)
    (repo / "refs").mkdir()
    (repo / "refs" / "main").write_text(commit)
    model = _write_float_checkpoint(str(snap))
    # declare fp32 in config.json for --dtype auto
    cfg_path = snap / "config.json"
    cfg = json.loads(cfg_path.read_text())
    cfg["torch_dtype"] = "float32"
    cfg_path.write_text(json.dumps(cfg))
    monkeypatch.setenv("QUANTO_TPU_HF_CACHE", str(tmp_path / "cache"))
    monkeypatch.setenv("QUANTO_TPU_OFFLINE", "1")

    dst = str(tmp_path / "out")
    rc = cli_main([
        "quantize", dst, "-m", "org/tiny", "--revision", "main",
        "--weights", "int8", "--dtype", "auto", "--exclude", "lm_head",
        "--trust-remote-code", "--task", "text-generation",
    ])
    assert rc == 0
    reloaded = QuantizedModelForCausalLM.from_pretrained(dst, dtype=jnp.float32)
    ids = jnp.asarray(np.array([[1, 5, 17]], dtype=np.int64))
    ref, _ = model(ids)
    out, _ = reloaded(ids)
    a, b = np.asarray(out).ravel(), np.asarray(ref).ravel()
    assert a @ b / (np.linalg.norm(a) * np.linalg.norm(b)) > 0.99
