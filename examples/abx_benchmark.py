"""The standing in-framework ABX benchmark table.

Runs :func:`shennong_tpu.eval.abx_bench.benchmark` — a fixed, seeded
synthetic corpus whose speakers differ by a stationary coloring (the
nuisance CMVN removes) and a vocal-tract formant scaling (the
nuisance VTLN models) — and prints the across/within ABX error table
in the reference's published row structure
(``/root/reference/doc/source/intro_features.rst:99-160``:
spectrogram / filterbank / mfcc / plp / rastaplp, raw / +CMVN /
VTLN+CMVN). The resulting numbers are recorded in
``doc/performance.md`` and locked by ``tests/test_abx_bench.py``.

Run:  python examples/abx_benchmark.py [--config full|ci] [--seed N]
          [--features mfcc,plp,...] [--json out.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--config', default='full',
                        choices=('full', 'ci'))
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--features', default='all',
                        help='comma list, or "all"')
    parser.add_argument('--json', default=None,
                        help='append one JSON line to this file')
    args = parser.parse_args()

    from shennong_tpu.eval.abx_bench import CONFIGS, FEATURES, benchmark
    from shennong_tpu.logger import get_logger

    features = (
        FEATURES if args.features == 'all'
        else tuple(args.features.split(',')))
    params = CONFIGS[args.config]
    print(f'config {args.config}: {params["nspeakers"]} speakers x '
          f'{params["nphones"]} phones x {params["tokens"]} tokens, '
          f'seed {args.seed}')

    start = time.time()
    out = benchmark(
        args.config, seed=args.seed, features=features,
        log=get_logger('abx-bench', 'info'))
    elapsed = time.time() - start

    for task in ('across', 'within'):
        print(f'\n{task}-speaker ABX error '
              f'({out["nsegments"]} segments):')
        print(f'{"features":<14}{"raw":>8}{"+CMVN":>8}'
              f'{"VTLN+CMVN":>11}')
        for feature in features:
            conds = out['errors'][task][feature]
            vtln = (f'{conds["vtln+cmvn"]:>10.1%}'
                    if 'vtln+cmvn' in conds else f'{"-":>10}')
            print(f'{feature:<14}{conds["raw"]:>8.1%}'
                  f'{conds["+cmvn"]:>8.1%}{vtln}')

    warps = out['warps']
    alphas = out['alphas']
    ordered = sorted(alphas, key=alphas.get)
    print('\nlearned warps vs true vocal-tract factor:')
    print('  alpha:', ' '.join(f'{alphas[s]:.3f}' for s in ordered))
    print('  warp :', ' '.join(f'{warps[s]:.3f}' for s in ordered))
    print(f'\ntotal {elapsed:.1f}s')

    if args.json:
        record = {
            'config': args.config, 'seed': args.seed,
            'elapsed_s': round(elapsed, 1),
            'errors': {
                task: {
                    feat: {k: round(v, 5) for k, v in conds.items()}
                    for feat, conds in out['errors'][task].items()}
                for task in out['errors']},
        }
        with open(args.json, 'a') as fp:
            fp.write(json.dumps(record) + '\n')


if __name__ == '__main__':
    main()
