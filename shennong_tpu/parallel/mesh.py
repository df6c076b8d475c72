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
