"""Command-line interface.

TPU-native analogue of the reference CLI
(`optimum/quanto/subpackage/commands/quantize.py:95-128`: `optimum-cli quanto
quantize`). Usage:

    python -m quanto_tpu.cli quantize OUTPUT_DIR -m MODEL_DIR \
        --weights {int2,int4,int8,float8} [--activations {none,int8,float8}] \
        --dtype {bf16,fp32} [--include PAT ...] [--exclude PAT ...]

    python -m quanto_tpu.cli inspect MODEL_DIR

`MODEL_DIR` is a local Hugging Face checkpoint directory (config.json +
model.safetensors[.index.json]) of a supported architecture (llama, mistral,
qwen2, gpt2), or a quantized directory produced by this CLI / the torch
reference (quanto_qmap.json present).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


# Same user-facing names as the reference CLI (`commands/quantize.py:47-52`,
# which maps e.g. "int8" -> qint8). int2 is accepted here (the reference
# restricts the CLI to int4/int8/float8 even though the library supports int2).
WEIGHT_CHOICES = ["int2", "int4", "int8", "float8"]
ACTIVATION_CHOICES = ["none", "int8", "float8"]


def _to_qtype_name(name: str) -> str:
    return {"float8": "qfloat8_e4m3fn"}.get(name, f"q{name}")


def cmd_quantize(args) -> int:
    import jax.numpy as jnp

    from .models import (
        QuantizedModelForCausalLM,
        QuantizedModelForSeq2SeqLM,
        from_pretrained_float,
    )

    from .models.hub import resolve_model_path

    # Resolve once; everything downstream gets the local directory.
    directory = resolve_model_path(args.model, revision=args.revision, cache_dir=args.cache_dir)
    if args.dtype == "auto":
        # Reference `--torch_dtype auto` (`commands/quantize.py:74-80`):
        # take the checkpoint's own dtype from config.json.
        with open(os.path.join(directory, "config.json")) as f:
            declared = json.load(f).get("torch_dtype", "bfloat16")
        dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "float16": jnp.bfloat16}.get(
            declared, jnp.bfloat16
        )
    else:
        dtype = {"bf16": jnp.bfloat16, "fp32": jnp.float32}[args.dtype]
    print(f"loading float model from {args.model} ...", file=sys.stderr)
    model = from_pretrained_float(directory, dtype=dtype)
    weights = _to_qtype_name(args.weights)
    activations = None if args.activations == "none" else _to_qtype_name(args.activations)
    print(f"quantizing weights={weights} activations={activations} ...", file=sys.stderr)
    model_type = getattr(getattr(model, "_hf_config", None), "model_type", None)
    if args.task == "text2text-generation":
        wrapper = QuantizedModelForSeq2SeqLM
    elif args.task == "text-generation":
        wrapper = QuantizedModelForCausalLM
    else:  # auto: infer from the architecture family
        wrapper = (
            QuantizedModelForSeq2SeqLM
            if model_type in ("t5", "mt5", "whisper")
            else QuantizedModelForCausalLM
        )
    qmodel = wrapper.quantize(
        model,
        weights=weights,
        activations=activations,
        include=args.include or None,
        exclude=args.exclude or None,
    )
    qmodel.save_pretrained(args.output)
    print(f"saved quantized model to {args.output}", file=sys.stderr)
    return 0


def cmd_inspect(args) -> int:
    from .utils.safetensors_io import safe_open_header

    qmap_path = os.path.join(args.model, "quanto_qmap.json")
    if os.path.exists(qmap_path):
        with open(qmap_path) as f:
            qmap = json.load(f)
        kinds = {}
        for cfg in qmap.values():
            key = (cfg["weights"], cfg["activations"])
            kinds[key] = kinds.get(key, 0) + 1
        print(f"quantized modules: {len(qmap)}")
        for (w, a), n in sorted(kinds.items()):
            print(f"  weights={w} activations={a}: {n} modules")
    else:
        print("not quantized (no quanto_qmap.json)")
    st_path = os.path.join(args.model, "model.safetensors")
    if os.path.exists(st_path):
        header = safe_open_header(st_path)
        total = 0
        by_dtype = {}
        for name, info in header.items():
            if name == "__metadata__":
                continue
            start, end = info["data_offsets"]
            total += end - start
            by_dtype[info["dtype"]] = by_dtype.get(info["dtype"], 0) + (end - start)
        print(f"tensor bytes: {total/1e6:.1f} MB")
        for dt, n in sorted(by_dtype.items(), key=lambda kv: -kv[1]):
            print(f"  {dt}: {n/1e6:.1f} MB")
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="quanto_tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    q = sub.add_parser("quantize", help="Quantize a Hugging Face checkpoint")
    q.add_argument("output", help="output directory")
    q.add_argument(
        "-m", "--model", required=True,
        help="local HF checkpoint directory or hub id (resolved via models.hub)",
    )
    q.add_argument("--weights", choices=WEIGHT_CHOICES, default="int8")
    q.add_argument("--activations", choices=ACTIVATION_CHOICES, default="none")
    q.add_argument("--dtype", choices=["auto", "bf16", "fp32"], default="bf16",
                   help="'auto' reads torch_dtype from config.json (reference --torch_dtype auto)")
    q.add_argument("--revision", default=None,
                   help="hub revision (tag/branch/commit) when -m is a hub id")
    q.add_argument("--cache-dir", default=None, help="hub cache directory")
    q.add_argument("--trust-remote-code", action="store_true",
                   help="accepted for reference-CLI parity; quanto_tpu ships its own "
                   "NNX architectures, so no remote code is ever executed")
    q.add_argument("--task", choices=["auto", "text-generation", "text2text-generation"],
                   default="auto", help="model head selection (reference --task)")
    q.add_argument("--include", action="append", help="fnmatch pattern(s) to include")
    q.add_argument("--exclude", action="append", help="fnmatch pattern(s) to exclude")
    q.set_defaults(fn=cmd_quantize)

    i = sub.add_parser("inspect", help="Describe a (quantized) model directory")
    i.add_argument("model")
    i.set_defaults(fn=cmd_inspect)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
