"""SegGPT inference CLI — mirrors ``SegGPT_inference/seggpt_inference.py``.

Usage:
    python -m painter_tpu.infer.seggpt_cli --ckpt_path seggpt_vit_large.pth \
        --input_image img.jpg --prompt_image p.jpg --prompt_target t.png \
        --output_dir out/ [--seg_type instance] [--num_frames 4]
"""
import argparse
import os


def get_args_parser():
    parser = argparse.ArgumentParser("SegGPT inference (TPU)",
                                     add_help=False)
    parser.add_argument("--ckpt_path", type=str, default=None,
                        help="path to torch .pth or orbax checkpoint")
    parser.add_argument("--model", type=str,
                        default="seggpt_vit_large_patch16_input896x448")
    parser.add_argument("--input_image", type=str, default=None)
    parser.add_argument("--input_video", type=str, default=None)
    parser.add_argument("--num_frames", type=int, default=0)
    parser.add_argument("--prompt_image", type=str, nargs="+", default=None)
    parser.add_argument("--prompt_target", type=str, nargs="+", default=None)
    parser.add_argument("--seg_type", type=str, default="instance",
                        choices=["instance", "semantic"])
    parser.add_argument("--device", type=str, default=None,
                        help="unused (kept for reference-CLI parity)")
    parser.add_argument("--output_dir", type=str, default="./")
    parser.add_argument("--quant", type=str, default="none",
                        choices=["none", "int8", "int8-fused"],
                        help="int8: w8a8 quantized serving gemms "
                             "(ops/quant.py; measured speedup + deviation "
                             "in BASELINE.md); int8-fused additionally "
                             "routes the MLP through the fused Pallas "
                             "kernel (measured on-par; kernels/int8_mlp)")
    return parser


def prepare_model(ckpt_path, model_name, seg_type, quant="none"):
    import jax
    from painter_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from painter_tpu import configs
    from painter_tpu.infer.engine import InContextModel
    from painter_tpu.models import incontext_vit as model_lib
    from painter_tpu.train import checkpoint as ckpt_lib

    cfg = configs.get_config(model_name, dtype="bfloat16")
    init = model_lib.init_params(jax.random.PRNGKey(0), cfg)
    params = (ckpt_lib.load_torch_params(ckpt_path, cfg, init=init)
              if ckpt_path else init)
    if quant in ("int8", "int8-fused"):
        from painter_tpu.ops import quant as quant_lib
        params = quant_lib.quantize_params(params)
        if quant == "int8-fused":
            quant_lib.MLP_IMPL = "fused"
    elif quant != "none":
        raise ValueError(quant)
    return InContextModel(cfg, params, seg_type=seg_type)


def main():
    args = get_args_parser().parse_args()
    from painter_tpu.infer.engine import inference_image, inference_video

    assert args.input_image or args.input_video
    model = prepare_model(args.ckpt_path, args.model, args.seg_type,
                          quant=args.quant)
    print("Model loaded.")
    os.makedirs(args.output_dir, exist_ok=True)

    if args.input_image is not None:
        assert args.prompt_image and args.prompt_target
        out_path = os.path.join(
            args.output_dir,
            "output_" + os.path.basename(args.input_image).split(".")[0]
            + ".png")
        inference_image(model, args.input_image, args.prompt_image,
                        args.prompt_target, out_path)
    else:
        assert args.prompt_target and len(args.prompt_target) == 1
        out_path = os.path.join(
            args.output_dir,
            "output_" + os.path.basename(args.input_video).split(".")[0]
            + ".mp4")
        inference_video(model, args.input_video, args.num_frames,
                        args.prompt_image, args.prompt_target, out_path)
    print("Finished.")


if __name__ == "__main__":
    main()
