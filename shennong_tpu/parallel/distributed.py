"""Multi-host distributed extraction (DCN-scale).

Replaces the reference's SLURM fan-out scripts (its only cluster
story, ``examples/features_abx/run.sh``) with ``jax.distributed``:
each host initializes into the global runtime, processes its shard of
the utterance list on its local devices, and corpus statistics (CMVN,
GMM EM accumulators) reduce over the global mesh — ICI within a pod,
DCN across hosts — instead of through the filesystem.
"""

import jax

from shennong_tpu.logger import get_logger


def initialize(coordinator_address=None, num_processes=None,
               process_id=None, log=get_logger('distributed', 'info')):
    """Join the multi-host runtime (no-op when single-process).

    Arguments default to the cluster auto-detection of
    ``jax.distributed.initialize`` (TPU pods populate them from the
    environment).
    """
    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)
    log.info(
        'joined distributed runtime: process %d/%d, %d local / %d '
        'global devices', jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count())


def shard_utterances(utterances, process_index=None,
                     process_count=None):
    """The contiguous slice of ``utterances`` owned by this host.

    Utterances are split round-robin after sorting (the collection
    iterates in sorted order), balancing counts across hosts; features
    computed per host can be saved independently or gathered by the
    caller.
    """
    if process_index is None:
        process_index = jax.process_index()
    if process_count is None:
        process_count = jax.process_count()

    owned = [
        utt for i, utt in enumerate(utterances)
        if i % process_count == process_index]
    if not owned:
        return None
    from shennong_tpu import Utterances
    return Utterances(owned)
