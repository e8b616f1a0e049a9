"""Interactive demo (L8) — the reference's ``SegGPT/app_gradio.py``
equivalent.

The reference demo is a 3-tab gradio UI that POSTs images to a remote
HTTP endpoint it does not ship (``app_gradio.py:25,47,70``). Here the
demo runs the model locally. gradio is not baked into this image, so the
UI is gated behind an import; without it the module still provides the
HTTP inference endpoint the reference's UI assumed but never shipped:

    python -m painter_tpu.infer.demo_app serve --port 8080
        # POST /paint {image: b64 png, prompt_image: b64, prompt_target:
        #              b64, seg_type?} -> {output: b64 png}
    python -m painter_tpu.infer.demo_app ui    # gradio, if installed
"""
from __future__ import annotations

import argparse
import base64
import io
import json


def _decode_b64_image(data: str):
    import numpy as np
    from PIL import Image
    return np.array(Image.open(io.BytesIO(base64.b64decode(data)))
                    .convert("RGB"))


def _encode_b64_image(arr) -> str:
    import numpy as np
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(np.asarray(arr, np.uint8)).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def _build_model(ckpt_path, model_name, seg_type="semantic"):
    from painter_tpu.infer.seggpt_cli import prepare_model
    return prepare_model(ckpt_path, model_name, seg_type)


def _run(model, image, prompt_image, prompt_target):
    import numpy as np
    from PIL import Image
    from painter_tpu.infer.engine import (TASK_SPECS, build_prompt_batch,
                                          scale_and_resize)
    res = model.cfg.img_size[1]
    size = (image.shape[1], image.shape[0])
    query = np.array(Image.fromarray(image).resize((res, res))) / 255.0
    p_img = np.array(Image.fromarray(prompt_image).resize((res, res))) \
        / 255.0
    p_tgt = np.array(Image.fromarray(prompt_target).resize(
        (res, res), Image.NEAREST)) / 255.0
    imgs, tgts = build_prompt_batch(query, [(p_img, p_tgt)])
    out = model.run_one_image(imgs, tgts)
    out = scale_and_resize(out, size, TASK_SPECS["seggpt"])
    composite = image * (0.6 * out / 255 + 0.4)
    return composite.astype("uint8")


def serve(args):
    from http.server import BaseHTTPRequestHandler, HTTPServer

    model = _build_model(args.ckpt_path, args.model, args.seg_type)
    print("model ready")

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            if self.path != "/paint":
                self.send_error(404)
                return
            length = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(length))
            out = _run(model,
                       _decode_b64_image(req["image"]),
                       _decode_b64_image(req["prompt_image"]),
                       _decode_b64_image(req["prompt_target"]))
            body = json.dumps({"output": _encode_b64_image(out)}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    server = HTTPServer(("127.0.0.1", args.port), Handler)
    print(f"serving on 127.0.0.1:{args.port}")
    server.serve_forever()


def ui(args):
    try:
        import gradio as gr
    except ImportError:
        raise SystemExit("gradio is not installed in this image; "
                         "use `serve` for the HTTP endpoint instead")
    model = _build_model(args.ckpt_path, args.model, args.seg_type)

    def infer(image, prompt_image, prompt_target):
        return _run(model, image, prompt_image, prompt_target)

    demo = gr.Interface(
        fn=infer,
        inputs=[gr.Image(label="query"), gr.Image(label="prompt image"),
                gr.Image(label="prompt target")],
        outputs=gr.Image(label="output"),
        title="SegGPT-TPU: segment everything in context")
    demo.launch(server_port=args.port)


def main():
    p = argparse.ArgumentParser("painter-tpu demo")
    p.add_argument("mode", choices=["serve", "ui"])
    p.add_argument("--ckpt_path", default=None)
    p.add_argument("--model",
                   default="seggpt_vit_large_patch16_input896x448")
    p.add_argument("--seg_type", default="semantic")
    p.add_argument("--port", type=int, default=8080)
    args = p.parse_args()
    (serve if args.mode == "serve" else ui)(args)


if __name__ == "__main__":
    main()
