"""Example client for the TransVAE serving endpoint (cli/serve.py).

Sends images as uint8 npy (1/4 the upload bytes of fp32; decoded/scaled on
device) and requests uint8 responses (1/4 the download bytes, quantized on
device before the device->host fetch).

Usage:
  python -m deepl_project_tpu.cli.serve --checkpoint runs/large/checkpoints \
      --warmup_resolution 256 --warmup_dtypes uint8 --warmup_uint8_inputs &
  python examples/serving_client.py --host 127.0.0.1 --port 8471 image.png
"""

import argparse
import io
import urllib.request

import numpy as np


def post_npy(url: str, arr: np.ndarray, timeout: float = 600.0) -> np.ndarray:
    buf = io.BytesIO()
    np.save(buf, arr)
    with urllib.request.urlopen(url, data=buf.getvalue(),
                                timeout=timeout) as r:
        return np.load(io.BytesIO(r.read()))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("images", nargs="*", help="image files (PNG/JPEG)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8471)
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--op", default="reconstruct",
                   choices=["reconstruct", "encode", "decode"])
    p.add_argument("--out", default="served_out")
    args = p.parse_args()

    base = f"http://{args.host}:{args.port}"
    import json
    health = json.load(urllib.request.urlopen(f"{base}/healthz", timeout=10))
    print("server:", health["variant"], "on", health["device"])

    if args.images:
        from PIL import Image

        from deepl_project_tpu.data.transforms import preprocess_image

        batch = np.stack([
            (preprocess_image(Image.open(f).convert("RGB"),
                              args.resolution) * 255).astype(np.uint8)
            for f in args.images])
    else:
        print("no images given; sending one random uint8 image")
        batch = np.random.randint(0, 256,
                                  (1, args.resolution, args.resolution, 3),
                                  dtype=np.uint8)

    out = post_npy(f"{base}/{args.op}?dtype=uint8", batch)
    print(f"{args.op}: {batch.shape} {batch.dtype} -> {out.shape} {out.dtype}")
    if args.op == "reconstruct":
        import os

        from PIL import Image

        os.makedirs(args.out, exist_ok=True)
        for i, img in enumerate(out):
            Image.fromarray(img).save(f"{args.out}/recon_{i:03d}.png")
        print(f"wrote {len(out)} reconstructions to {args.out}/")


if __name__ == "__main__":
    main()
