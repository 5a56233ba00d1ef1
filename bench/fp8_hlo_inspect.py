"""Inspect the optimized HLO of an fp8-weight decode step to find why the
full program trails int8 (RESULTS.md known issue: fp8 591 tok/s vs int8 708
despite identical isolated-matmul times).

Hypothesis: XLA materializes some f8->bf16 converts as standalone fusions
(full-width bf16 weight copies in HBM) instead of fusing the convert into
the dot's operand read. This dumps every convert(f8) site with its parent
fusion kind and operand/result buffer sizes.
"""

from __future__ import annotations

import re
import sys

import jax
import jax.numpy as jnp
from flax import nnx

import quanto_tpu as qt
from quanto_tpu.models import LlamaConfig, LlamaForCausalLM
from quanto_tpu.models.llama import init_kv_cache
from quanto_tpu.models.serve import make_decode_fn


def main():
    n_layers = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    config = LlamaConfig(
        vocab_size=32000, hidden_size=2048, intermediate_size=5632,
        num_hidden_layers=n_layers, num_attention_heads=32, num_key_value_heads=8,
        max_position_embeddings=2048, dtype=jnp.bfloat16,
    )
    model = LlamaForCausalLM(config, rngs=nnx.Rngs(0))
    qt.quantize(model, weights="qfloat8", exclude="lm_head")
    qt.freeze(model)

    graphdef, state = nnx.split(model)
    decode = make_decode_fn(graphdef, 8)
    cache = init_kv_cache(config, 1, 640, config.dtype)
    first = jnp.zeros((1, 1), jnp.int32)

    lowered = decode.lower(state, first, cache, 512)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    with open("/tmp/fp8_decode_hlo.txt", "w") as f:
        f.write(hlo)
    print(f"HLO: {len(hlo.splitlines())} lines -> /tmp/fp8_decode_hlo.txt")

    # Where do f8e4m3fn buffers appear?
    lines = hlo.splitlines()
    n_f8 = sum("f8e4m3" in l for l in lines)
    print(f"lines mentioning f8e4m3: {n_f8}")

    # Standalone convert fusions: fusion whose root converts f8 -> something,
    # i.e. a materialized full-width copy.
    in_fusion = None
    fusion_has_dot = {}
    fusion_has_f8conv = {}
    for l in lines:
        m = re.match(r"\s*%?(\S+)\s*=.*fusion\(", l)
        mc = re.match(r"(\S+)\s+\{", l.strip())
        if "ENTRY" in l or re.match(r"^%?\w[\w\.\-]*\s+\{", l.strip()):
            in_fusion = l.strip().split()[0].lstrip("%").rstrip("{").strip()
            continue
        if in_fusion:
            if "dot(" in l or "dot_general" in l:
                fusion_has_dot[in_fusion] = True
            if "convert" in l and "f8e4m3" in l:
                fusion_has_f8conv[in_fusion] = fusion_has_f8conv.get(in_fusion, 0) + 1
    print("\ncomputations containing f8 converts:")
    for comp, n in fusion_has_f8conv.items():
        print(f"  {comp}: {n} f8-converts, has_dot={fusion_has_dot.get(comp, False)}")

    # Large bf16 buffers created by converting f8 (materialized copies).
    for i, l in enumerate(lines):
        if "convert" in l and "f8e4m3" in l:
            mm = re.search(r"bf16\[([\d,]+)\]", l)
            if mm:
                shape = [int(v) for v in mm.group(1).split(",")]
                numel = 1
                for v in shape:
                    numel *= v
                if numel >= 2048 * 2048:
                    print(f"L{i}: LARGE bf16 convert of f8 operand: {l.strip()[:160]}")


if __name__ == "__main__":
    main()
