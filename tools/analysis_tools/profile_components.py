"""Component-level timing of the inference path on the current backend.

Times (each as its own jitted program, chained x8 inside one dispatch,
best of several spread windows — see dcn_bench.timed for why):

  * op-overhead probe: k back-to-back convs for k=1,4 -> per-op cost
    vs per-iteration overhead,
  * backbone+neck,
  * full forward (head incl. recursive update),
  * full forward with the recursive-update branch ablated (num_layers=0)
    -> the RU contribution by difference,
  * fused decode.

Select a subset with --only (comma list) to keep sessions short.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))


def timed(fn, args, iters=8, perturb_idx=0, windows=5):
    import numpy as np
    import jax
    import jax.numpy as jnp
    import jax.lax as lax

    args = list(args)

    def chained(*a):
        a = list(a)

        def body(_, x):
            out = fn(*[x if j == perturb_idx else a[j]
                       for j in range(len(a))])
            # fold ONE scalar from EVERY output leaf into the feedback —
            # touching only one leaf lets XLA dead-code-eliminate the
            # rest of the network (observed: "full forward" measured the
            # cls tower alone)
            eps = sum(leaf.astype(jnp.float32).ravel()[0]
                      for leaf in jax.tree.leaves(out))
            return x + (eps * 1e-20).astype(x.dtype)
        return lax.fori_loop(0, iters, body, a[perturb_idx])

    cfn = jax.jit(chained)
    out = cfn(*args)
    np.asarray(out.ravel()[:1])
    best = float('inf')
    for w in range(windows):
        a0 = args[perturb_idx] + 1e-6 * (w + 1)
        wargs = [a0 if i == perturb_idx else a for i, a in enumerate(args)]
        t0 = time.perf_counter()
        out = cfn(*wargs)
        np.asarray(out.ravel()[:1])
        best = min(best, time.perf_counter() - t0)
        time.sleep(2.0)
    return best / iters


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--height', type=int, default=640)
    parser.add_argument('--width', type=int, default=1152)
    parser.add_argument('--batch', type=int, default=4)
    parser.add_argument('--dtype', default='bfloat16')
    parser.add_argument('--only', default='',
                        help='comma list: ops,backbone,full,noru,decode')
    parser.add_argument('--ru-gather-mode', default=None,
                        help="override recursive_update.gather_mode "
                             "(clip|one_hot|patch) for the full-forward "
                             "measurement")
    args = parser.parse_args()
    only = set(args.only.split(',')) if args.only else None

    def want(k):
        return only is None or k in only

    import numpy as np
    import jax
    import jax.numpy as jnp
    from das_tpu.utils.cache import jax_cache_dir
    jax.config.update('jax_compilation_cache_dir', jax_cache_dir())

    from das_tpu.config import Config
    from das_tpu.models import build_model
    from das_tpu.core.decode import decode_batch

    dtype = getattr(jnp, args.dtype)
    cfg = Config.fromfile('configs/das/exp_panoptic.py')
    if args.ru_gather_mode:
        cfg.merge_from_dict({
            'model.bbox_head.recursive_update.gather_mode':
                args.ru_gather_mode})
    B, H, W = args.batch, args.height, args.width
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(B, H, W, 3), jnp.float32)

    if want('ops'):
        # per-op overhead probe: k chained convs; slope = real conv cost
        import jax.lax as lax
        x = jnp.asarray(rng.randn(B, 80, 144, 256), dtype)
        w = jnp.asarray(rng.randn(3, 3, 256, 256) * 0.05, dtype)
        ts = {}
        for k in (1, 4):
            def convk(x, w, k=k):
                for _ in range(k):
                    x = lax.conv_general_dilated(
                        x, w, (1, 1), ((1, 1), (1, 1)),
                        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                        preferred_element_type=dtype)
                return x
            ts[k] = timed(convk, [x, w])
            print(f'{k} chained convs/iter: {ts[k] * 1e3:7.2f} ms',
                  flush=True)
        per_conv = (ts[4] - ts[1]) / 3
        print(f'-> real per-conv cost {per_conv * 1e3:.2f} ms, per-iter '
              f'overhead {(ts[1] - per_conv) * 1e3:.2f} ms', flush=True)

    model = build_model(dict(cfg.model), dtype=dtype)
    variables = dict(model.init_all(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 64, 64, 3))))
    head = cfg.model.bbox_head
    strides = tuple(head.strides)
    J = int(head.num_joints)

    if want('backbone'):
        t = timed(lambda x: model.apply(
            variables, x, False, method=type(model).extract_feat), [img])
        print(f'backbone+neck: {t * 1e3:7.1f} ms ({B / t:5.1f} img/s)',
              flush=True)

    outs = None
    if want('full'):
        t = timed(lambda x: model.apply(variables, x, train=False), [img])
        print(f'full forward:  {t * 1e3:7.1f} ms ({B / t:5.1f} img/s)',
              flush=True)

    if want('noru'):
        mc = dict(cfg.model)
        mc['bbox_head'] = dict(
            mc['bbox_head'],
            recursive_update=dict(mc['bbox_head']['recursive_update'],
                                  num_layers=0))
        m2 = build_model(mc, dtype=dtype)
        v2 = dict(m2.init_all(jax.random.PRNGKey(0),
                              jnp.zeros((1, 64, 64, 3))))
        t = timed(lambda x: m2.apply(v2, x, train=False), [img])
        print(f'fwd w/o RU:    {t * 1e3:7.1f} ms ({B / t:5.1f} img/s)',
              flush=True)

    if want('decode'):
        outs = jax.jit(lambda v, x: model.apply(v, x, train=False))(
            variables, img)
        cls_scores, pose_preds, centernesses, _ = outs
        sf = jnp.ones((B, 2), jnp.float32)
        dec = lambda s, c, p, t_: decode_batch(
            c, p, t_, strides, s, J, dict(cfg.model.test_cfg))
        t = timed(dec, [sf, list(cls_scores), list(pose_preds),
                        list(centernesses)], perturb_idx=0)
        print(f'decode:        {t * 1e3:7.1f} ms', flush=True)


if __name__ == '__main__':
    main()
