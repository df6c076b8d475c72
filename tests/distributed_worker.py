"""Worker process for test_distributed_process.py (not a test module).

Joins a two-process ``jax.distributed`` runtime on the CPU platform,
extracts its utterance shard through
:func:`shennong_tpu.parallel.distributed.extract_features` (pass 1 on
the local shard, CMVN statistics allreduced across processes, pass 2
locally) and saves the shard's features.
"""

import sys


def main():
    utts_file, outfile, coordinator, nproc, pid = sys.argv[1:6]

    import jax
    # pin CPU before any backend initializes (an accelerator plugin
    # would otherwise grab the runtime ahead of the distributed join)
    jax.config.update('jax_platforms', 'cpu')

    from shennong_tpu import Utterances
    from shennong_tpu.parallel import distributed
    from shennong_tpu.pipeline import get_default_config

    distributed.initialize(coordinator, int(nproc), int(pid))
    assert jax.process_count() == int(nproc), jax.process_count()

    config = get_default_config(
        'mfcc', with_cmvn=True, with_delta=True)
    config['mfcc']['dither'] = 0

    features = distributed.extract_features(
        config, Utterances.load(utts_file))
    features.save(outfile)
    return 0


if __name__ == '__main__':
    sys.exit(main())
