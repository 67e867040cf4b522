"""Stereo-image demo CLI (reference ``basicsr/demo_ssr.py``):

``python -m lowlight_image_enhancement_tpu.demo_ssr -opt <yaml>
--input_l_path l.png --input_r_path r.png
--output_l_path out_l.png --output_r_path out_r.png``

Reads the left/right views, concatenates them on channels (the NAFSSR
input contract, reference ``demo_ssr.py:88-92`` — torch concatenates on
the channel dim), runs the stereo network, splits the output back into
views, writes both.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from lowlight_image_enhancement_tpu.demo import read_image, write_image
from lowlight_image_enhancement_tpu.models import define_network
from lowlight_image_enhancement_tpu.training import checkpoint as ckpt
from lowlight_image_enhancement_tpu.training.config import parse
from lowlight_image_enhancement_tpu.training.train_step import make_eval_step


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("-opt", required=True)
    parser.add_argument("--input_l_path", required=True)
    parser.add_argument("--input_r_path", required=True)
    parser.add_argument("--output_l_path", required=True)
    parser.add_argument("--output_r_path", required=True)
    args = parser.parse_args()
    opt = parse(args.opt, is_train=False)

    img_l = read_image(args.input_l_path)
    img_r = read_image(args.input_r_path)
    if img_l.shape != img_r.shape:
        raise ValueError(
            f"left/right shapes differ: {img_l.shape} vs {img_r.shape}")
    x = jnp.asarray(np.concatenate([img_l, img_r], axis=-1))  # [1,H,W,2C]

    net = define_network(dict(opt["network_g"]))
    variables = net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 64, 64, x.shape[-1])))
    params = variables["params"]
    pretrain = (opt.get("path", {}) or {}).get("pretrain_network_g")
    if pretrain:
        params = ckpt.restore_network(pretrain, params)

    eval_fn = make_eval_step(net)
    out = np.asarray(eval_fn(params, x))
    c = out.shape[-1] // 2
    write_image(args.output_l_path, out[..., :c])
    write_image(args.output_r_path, out[..., c:])
    print(f"inference {args.input_l_path} .. finished. "
          f"saved to {args.output_l_path}")
    print(f"inference {args.input_r_path} .. finished. "
          f"saved to {args.output_r_path}")


if __name__ == "__main__":
    main()
