"""Device mesh helpers for data-parallel feature extraction."""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


DATA_AXIS = 'data'


def data_mesh(devices=None):
    """A 1-D mesh over the given (or all) devices, axis name 'data'.

    Feature extraction is embarrassingly parallel over utterances, so
    a single data axis covers dp scaling; collectives only appear for
    corpus-level statistics (CMVN, GMM accumulators) as psums over
    this axis.
    """
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh):
    """Sharding placing the leading (utterance) axis over the mesh"""
    return NamedSharding(mesh, PartitionSpec(DATA_AXIS))


def replicated(mesh):
    """Fully replicated sharding on the mesh"""
    return NamedSharding(mesh, PartitionSpec())


_DEFAULT_MESH = None


def set_default_mesh(mesh):
    """Install a process-wide default mesh.

    Executors created without an explicit mesh (including everything
    inside :func:`shennong_tpu.pipeline.extract_features`) shard their
    batches over it. Pass None to restore single-device execution.
    """
    global _DEFAULT_MESH
    _DEFAULT_MESH = mesh


def get_default_mesh():
    """The process-wide default mesh, or None"""
    return _DEFAULT_MESH
