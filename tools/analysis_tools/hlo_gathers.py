"""Dump gather/scatter op statistics from the compiled head HLO."""
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from das_tpu.utils.cache import jax_cache_dir
    jax.config.update('jax_compilation_cache_dir', jax_cache_dir())

    from das_tpu.config import Config
    from das_tpu.models import build_model

    cfg = Config.fromfile('configs/das/exp_panoptic.py')
    model = build_model(dict(cfg.model), dtype=jnp.bfloat16)
    B, H, W = 4, 640, 1152
    img = jnp.zeros((B, H, W, 3), jnp.float32)
    variables = dict(model.init_all(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 64, 64, 3))))

    def full(v, x):
        return model.apply(v, x, train=False)

    txt = jax.jit(full).lower(variables, img).compile().as_text()
    with open('/tmp/head_hlo.txt', 'w') as f:
        f.write(txt)

    stats = defaultdict(lambda: [0, 0.0])
    for line in txt.splitlines():
        m = re.search(r'= (\S+?)\(', line.strip())
        if not m:
            continue
        op = m.group(1)
        shape_m = re.match(r'\s*(?:ROOT )?\S+ = ((?:\w+\[[^\]]*\]|\()\S*)',
                           line)
        # rough output element count
        elems = 0
        sm = re.findall(r'\w+\[([0-9,]*)\]', line.split('=')[0] +
                        '=' + line.split('=')[1][:200] if '=' in line
                        else line)
        if sm:
            dims = sm[0]
            if dims:
                n = 1
                for d in dims.split(','):
                    if d:
                        n *= int(d)
                elems = n
        stats[op][0] += 1
        stats[op][1] += elems

    rows = sorted(stats.items(), key=lambda kv: -kv[1][1])
    print(f'{"op":28s} {"count":>6s} {"out elems (M)":>14s}')
    for op, (cnt, elems) in rows[:25]:
        print(f'{op:28s} {cnt:6d} {elems / 1e6:14.1f}')

    # biggest gather lines
    print('\nLargest gather/dynamic ops:')
    gl = [ln.strip() for ln in txt.splitlines()
          if re.search(r'= (gather|dynamic-gather|dynamic-slice)\(',
                       ln)]
    def out_elems(ln):
        m = re.match(r'\S+\s*=\s*\w+\[([0-9,]*)\]', ln)
        if not m or not m.group(1):
            return 0
        n = 1
        for d in m.group(1).split(','):
            n *= int(d)
        return n
    gl.sort(key=out_elems, reverse=True)
    for ln in gl[:12]:
        print(' ', ln[:180])


if __name__ == '__main__':
    main()
