"""Full-width multichip SPMD exercise (once-per-round, non-driver).

The driver's ``dryrun_multichip`` proves the SPMD train-step path on a
width-reduced model (1-core host: the full-size program cold-compiles
for tens of minutes). This tool covers the complementary axis: the REAL
exp_panoptic model — 256 channels, 2 stages, 4 FPN levels, full head +
recursive update — over a small virtual CPU mesh with tiny (64x64)
images, proving the SPMD program compiles and executes at real
parameter shapes. Log the result in STATUS.md.

Run:  python tools/analysis_tools/fullwidth_dryrun.py [--devices 2]
"""

import argparse
import os
import subprocess
import sys

here = os.path.join(os.path.dirname(os.path.abspath(__file__)), '..', '..')
sys.path.insert(0, here)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--devices', type=int, default=2)
    p.add_argument('--timeout', type=int, default=3600)
    args = p.parse_args()

    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env['XLA_FLAGS'] = (
        env.get('XLA_FLAGS', '')
        + f' --xla_force_host_platform_device_count={args.devices}'
        + ' --xla_backend_optimization_level=0'
        + ' --xla_llvm_disable_expensive_passes=true').strip()
    env['PYTHONPATH'] = here + os.pathsep + env.get('PYTHONPATH', '')
    env['PALLAS_AXON_REMOTE_COMPILE'] = '0'
    code = (f'import __graft_entry__ as g; '
            f'g._dryrun_multichip_impl({args.devices}, use_cache=False, '
            f'full_width=True)')
    rc = subprocess.run([sys.executable, '-c', code], env=env, cwd=here,
                        timeout=args.timeout).returncode
    sys.exit(rc)


if __name__ == '__main__':
    main()
