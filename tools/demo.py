"""Single-image inference demo (ref: demo/ scripts + apis/inference.py:195).

Usage:
    python tools/demo.py configs/das/exp_panoptic.py CKPT image.jpg \
        [--out vis.jpg] [--score-thr 0.3]
Prints decoded people as JSON; optionally draws the 2D skeleton.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

SKELETON = [[0, 1], [0, 2], [0, 3], [3, 4], [4, 5], [0, 9], [9, 10],
            [10, 11], [2, 6], [2, 12], [6, 7], [7, 8], [12, 13], [13, 14]]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('config')
    parser.add_argument('checkpoint', nargs='?', default=None)
    parser.add_argument('image')
    parser.add_argument('--out', default=None)
    parser.add_argument('--score-thr', type=float, default=0.3)
    args = parser.parse_args()

    import cv2
    import numpy as np
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir', '/tmp/das_tpu_jax_cache')

    from das_tpu.apis.inference import (init_model, make_predict_fn,
                                        results_to_host)

    model, variables, cfg = init_model(args.config, args.checkpoint,
                                       dtype=jnp.bfloat16)
    head = cfg.model.bbox_head
    predict = make_predict_fn(model, dict(cfg.model.test_cfg),
                              int(head.num_joints), tuple(head.strides))

    img = cv2.imread(args.image)
    h, w = img.shape[:2]
    # test pipeline: keep-ratio resize to the config scale, normalize, pad
    scale = (1333, 640)
    ratio = min(max(scale) / max(h, w), min(scale) / min(h, w))
    nh, nw = int(h * ratio + 0.5), int(w * ratio + 0.5)
    resized = cv2.resize(img, (nw, nh)).astype(np.float32)
    mean = np.array([123.675, 116.28, 103.53], np.float32)
    std = np.array([58.395, 57.12, 57.375], np.float32)
    norm = (resized[..., ::-1] - mean) / std
    ph = (nh + 31) // 32 * 32
    pw = (nw + 31) // 32 * 32
    padded = np.zeros((ph, pw, 3), np.float32)
    padded[:nh, :nw] = norm

    sf = jnp.asarray([[nw / w, nh / h]], jnp.float32)
    decoded = predict(variables, jnp.asarray(padded)[None], sf)
    out = results_to_host(decoded, [args.image])[0]

    people = []
    for score, pose in zip(out['scores'], out['poses']):
        if score < args.score_thr:
            continue
        people.append(dict(score=float(score),
                           joints_uvd=np.asarray(pose).tolist()))
    print(json.dumps(dict(image=args.image, num_people=len(people),
                          people=people), indent=2))

    if args.out:
        for person in people:
            pts = np.asarray(person['joints_uvd'])[:, :2].astype(int)
            for a, b in SKELETON:
                if a < len(pts) and b < len(pts):
                    cv2.line(img, tuple(pts[a]), tuple(pts[b]),
                             (0, 255, 0), 2)
            for p in pts:
                cv2.circle(img, tuple(p), 3, (0, 0, 255), -1)
        cv2.imwrite(args.out, img)
        print(f'saved {args.out}')


if __name__ == '__main__':
    main()
