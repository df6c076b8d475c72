"""Warm in-process timings of UBM-GMM and 41-class LVTLN training.

Reproduces the corpus-scale training numbers in
``doc/performance.md`` ("Corpus scale"): a 200-utterance / ~1200 s /
10-speaker synthetic corpus, the reference training setup (UBM 64
gaussians, 8 init + 4 main EM iterations; LVTLN with the default
41-class warp grid, 3 estimation rounds — the reference trains the
same models in ``shennong/processor/ubm.py:714-772`` and
``vtln.py:511-664``), timed over several runs in ONE process: the
axon backend has no cross-process compile reuse, so run 0 is
compile-dominated and the later runs are the serving steady state.

Usage::

    python training_bench.py [<workdir>] [--utterances N] [--runs N]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(__file__))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('workdir', nargs='?', default='/tmp/shennong_train_bench')
    parser.add_argument('--utterances', type=int, default=200)
    parser.add_argument('--runs', type=int, default=3)
    args = parser.parse_args()

    from features_abx import make_synthetic_corpus
    from shennong_tpu import Utterances
    from shennong_tpu.processor import VtlnProcessor
    from shennong_tpu.processor.ubm import DiagUbmProcessor
    from shennong_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    items = make_synthetic_corpus(
        os.path.join(args.workdir, 'corpus'), args.utterances)
    utterances = Utterances(items)
    total = sum(utt.duration for utt in utterances)
    print(f'corpus: {len(items)} utterances, {total:.0f} s of audio',
          flush=True)

    setups = (
        ('ubm', lambda: DiagUbmProcessor(
            num_gauss=64, num_iters=4, num_iters_init=8)),
        ('vtln', lambda: VtlnProcessor(
            num_iters=3,
            ubm=dict(num_gauss=64, num_iters=4, num_iters_init=8))),
    )
    for label, make in setups:
        for run in range(args.runs):
            proc = make()
            proc.set_logger('warning')
            start = time.time()
            if label == 'ubm':
                proc.process(utterances, njobs=4)
            else:
                proc.process(utterances, group_by='speaker', njobs=4)
            wall = time.time() - start
            tag = 'cold' if run == 0 else 'warm'
            print(f'{label} run {run} ({tag}): {wall:.2f} s '
                  f'({total / wall:.0f}x RT)', flush=True)


if __name__ == '__main__':
    main()
