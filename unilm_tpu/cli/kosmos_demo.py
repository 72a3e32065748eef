"""Kosmos-2 grounded-caption demo.

Equivalent of kosmos-2/demo/gradio_app.py + demo/decode_string.py: take an
image and a prompt (default "<grounding>An image of"), generate grounded
markup, parse it into (phrase, bbox) entities, print them, and optionally
write an annotated copy of the image.

Offline-first: the default mode is a one-shot CLI (or a stdin REPL with
--repl); --serve starts the gradio UI when gradio is installed (it is not in
this environment's base image, so the flag degrades with a clear message
rather than an ImportError at startup).

Example:
    python -m unilm_tpu.cli.kosmos_demo --image cat.png \
        --prompt "<grounding>An image of" --annotate out.png
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

from unilm_tpu.cli.kosmos_ground_eval import model_generate
from unilm_tpu.data.grounding import parse_grounded_text
from unilm_tpu.data.vl_loaders import VLTokenizer, load_image


def caption(args, tok, image_path: str, prompt: str):
    """Generate + parse one grounded caption. Returns (clean, entities, raw)."""
    # the <grounding> control token is prepended by model_generate's prompt
    # builder; strip it from the user text if present (gradio_app.py does the
    # same normalization)
    text = prompt.replace("<grounding>", "").strip()
    prefix = tok.encode_text(text) if text else []
    rec = {"image": image_path}
    raw = model_generate(args, tok, [rec], [prefix])[0]
    clean, entities = parse_grounded_text(raw, args.quantized_size)
    return clean, entities, raw


def annotate(image_path: str, image_root: str, entities, out_path: str,
             image_size: int = 224) -> None:
    """Draw entity boxes on the image with PIL (the gradio app's overlay)."""
    from PIL import Image, ImageDraw

    arr = load_image(image_path, image_root, image_size, key=out_path)
    img = Image.fromarray((arr * 255).astype(np.uint8))
    draw = ImageDraw.Draw(img)
    W, H = img.size
    colors = ["red", "lime", "blue", "yellow", "magenta", "cyan", "orange"]
    for i, (phrase, boxes) in enumerate(entities):
        c = colors[i % len(colors)]
        for x0, y0, x1, y1 in boxes:
            draw.rectangle([x0 * W, y0 * H, x1 * W, y1 * H], outline=c, width=2)
            draw.text((x0 * W + 2, max(0.0, y0 * H - 10)), phrase[:24], fill=c)
    img.save(out_path)


def _print_result(clean, entities, raw, as_json=False):
    if as_json:
        print(json.dumps({"caption": clean, "raw": raw, "entities": [
            {"phrase": p, "boxes": [list(b) for b in bs]} for p, bs in entities
        ]}))
        return
    print(f"caption: {clean}")
    for phrase, boxes in entities:
        for b in boxes:
            print(f"  [{b[0]:.3f},{b[1]:.3f},{b[2]:.3f},{b[3]:.3f}] {phrase}")


def serve(args, tok):
    try:
        import gradio as gr
    except ImportError:
        print("gradio is not installed in this environment; use the one-shot "
              "CLI or --repl instead (pip install gradio to serve the UI).",
              file=sys.stderr)
        return 2

    def fn(image_path, prompt):
        clean, entities, _ = caption(args, tok, image_path, prompt)
        return clean, json.dumps(
            [{"phrase": p, "boxes": bs} for p, bs in entities], indent=2)

    gr.Interface(
        fn=fn,
        inputs=[gr.Image(type="filepath"), gr.Textbox(value="<grounding>An image of")],
        outputs=[gr.Textbox(label="caption"), gr.Textbox(label="entities")],
        title="Kosmos-2 grounded captioning",
    ).launch(server_name="0.0.0.0", server_port=args.port)
    return 0


def main(argv=None):
    p = argparse.ArgumentParser("Kosmos-2 grounded-caption demo")
    p.add_argument("--image", help="image path (a deterministic pseudo-image "
                                   "is used when the file is missing)")
    p.add_argument("--prompt", default="<grounding>An image of")
    p.add_argument("--annotate", default="", help="write annotated image here")
    p.add_argument("--json", action="store_true", help="machine-readable output")
    p.add_argument("--repl", action="store_true",
                   help="read `image_path<TAB>prompt` lines from stdin")
    p.add_argument("--serve", action="store_true", help="gradio UI (if installed)")
    p.add_argument("--port", type=int, default=7860)
    # model geometry (random weights unless --checkpoint; mirrors
    # kosmos_ground_eval so converted checkpoints plug in identically)
    p.add_argument("--image_root", default="")
    p.add_argument("--quantized_size", type=int, default=32)
    p.add_argument("--image_tokens", type=int, default=16)
    p.add_argument("--image_size", type=int, default=32)
    p.add_argument("--max_new_tokens", type=int, default=48)
    p.add_argument("--max_len", type=int, default=256)
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--layers", type=int, default=2)
    p.add_argument("--heads", type=int, default=4)
    p.add_argument("--clip_dim", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tokenizer", default="auto", choices=["auto", "tiktoken", "bytes"])
    p.add_argument("--cpu", action="store_true",
                   help="run on the CPU backend (the demo model is tiny; "
                        "JAX_PLATFORMS is ignored under the axon TPU plugin)")
    args = p.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    tok = VLTokenizer(args.quantized_size, backend=args.tokenizer)

    if args.serve:
        return serve(args, tok)

    if args.repl:
        for line in sys.stdin:
            line = line.rstrip("\n")
            if not line:
                continue
            img, _, prompt = line.partition("\t")
            clean, entities, raw = caption(args, tok, img, prompt or args.prompt)
            _print_result(clean, entities, raw, args.json)
        return 0

    clean, entities, raw = caption(args, tok, args.image, args.prompt)
    _print_result(clean, entities, raw, args.json)
    if args.annotate:
        annotate(args.image, args.image_root, entities, args.annotate,
                 args.image_size)
        print(f"annotated image -> {args.annotate}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
