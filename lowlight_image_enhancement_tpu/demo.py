"""Single-image demo CLI (reference ``basicsr/demo.py:18-59``):

``python -m lowlight_image_enhancement_tpu.demo -opt <yaml>
--input_path in.png --output_path out.png``

Reads one image, runs the (optionally tiled) restored forward, writes the
result.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from lowlight_image_enhancement_tpu.models import define_network
from lowlight_image_enhancement_tpu.training import checkpoint as ckpt
from lowlight_image_enhancement_tpu.training.config import parse
from lowlight_image_enhancement_tpu.training.train_step import make_eval_step
from lowlight_image_enhancement_tpu.training.validation import tiled_inference


def read_image(path: str) -> np.ndarray:
    """-> float32 [0,1] NHWC (N=1), RGB."""
    from lowlight_image_enhancement_tpu.utils import imgio

    img = imgio.imread(path)
    if img.ndim == 2:
        img = img[..., None].repeat(3, -1)
    return imgio.to_float01(img[..., :3])[None]


def write_image(path: str, img: np.ndarray) -> None:
    """NHWC float [0,1] -> 8-bit PNG."""
    from lowlight_image_enhancement_tpu.utils import imgio

    imgio.imwrite(path, imgio.to_uint8(np.asarray(img)[0]))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("-opt", required=True)
    parser.add_argument("--input_path", required=True)
    parser.add_argument("--output_path", required=True)
    parser.add_argument("--tile", type=int, default=None,
                        help="tile size for grids inference")
    args = parser.parse_args()
    opt = parse(args.opt, is_train=False)

    net = define_network(dict(opt["network_g"]))
    x = jnp.asarray(read_image(args.input_path))
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    params = variables["params"]
    pretrain = (opt.get("path", {}) or {}).get("pretrain_network_g")
    if pretrain:
        params = ckpt.restore_network(pretrain, params)

    eval_fn = make_eval_step(net)

    def forward(z):
        return eval_fn(params, z)

    out = (tiled_inference(forward, x, args.tile) if args.tile
           else forward(x))
    write_image(args.output_path, np.asarray(out))
    print(f"wrote {args.output_path}")


if __name__ == "__main__":
    main()
