"""Delta (time derivative) post-processor.

API-compatible with ``shennong/postprocessor/delta.py``; the
computation runs as a batched shifted-weighted-sum XLA kernel
(:func:`shennong_tpu.ops.postops.compute_deltas`) with Kaldi's
polynomial-fit coefficients and edge replication.
"""

import copy

import numpy as np

from shennong_tpu import Features
from shennong_tpu.ops import postops
from shennong_tpu.postprocessor.base import FeaturesPostProcessor


class DeltaPostProcessor(FeaturesPostProcessor):
    def __init__(self, order=2, window=2):
        super().__init__()
        self.order = order
        self.window = window

    @property
    def name(self):
        return 'delta'

    @property
    def order(self):
        """Highest derivative order to compute"""
        return self._order

    @order.setter
    def order(self, value):
        self._order = int(value)

    @property
    def window(self):
        """Half-width of the regression window per derivative order

        Each order looks at 2 * window + 1 frames; utterance edges
        replicate the first/last frame.

        """
        return self._window

    @window.setter
    def window(self, value):
        value = int(value)
        if not 0 < value < 1000:
            raise ValueError(
                'window must be in [1, 999], it is {}'.format(value))
        self._window = value

    @property
    def ndims(self):
        raise ValueError(
            'the delta output dimension is input-dependent '
            '((order + 1) times the input dimension)')

    def get_properties(self, features):
        properties = copy.deepcopy(features.properties)
        properties[self.name] = {
            'order': self.order, 'window': self.window}
        properties.setdefault('pipeline', []).append({
            'name': self.name,
            'columns': [0, (self.order + 1) * features.ndims - 1]})
        return properties

    def process(self, features):
        """Concatenate ``features`` with its time derivatives.

        Output has ``(order + 1) * ndims`` columns: the input followed
        by the derivative of each order.
        """
        padded, nframes = postops.pad_frame_axis(features.data)
        out = postops.compute_deltas(
            padded, nframes, order=self._order, window=self._window)
        return Features(
            np.asarray(out[0, :features.nframes]).astype(features.dtype),
            features.times,
            self.get_properties(features))

    def process_all(self, features_collection, njobs=None):
        """Deltas for a whole collection.

        Utterances group into padded masked batches by (frame bucket,
        dim): O(buckets) device programs instead of one per
        utterance. Returns a FeaturesCollection keyed like the input.
        """
        from shennong_tpu import FeaturesCollection

        names = list(features_collection.keys())
        arrays = [features_collection[n].data for n in names]
        out = FeaturesCollection()
        for chunk, stacked, nframes in postops.batch_ragged(arrays):
            deltas = np.asarray(postops.compute_deltas(
                stacked, nframes, order=self._order,
                window=self._window))
            for row, index in enumerate(chunk):
                feats = features_collection[names[index]]
                out[names[index]] = Features(
                    deltas[row, :feats.nframes].astype(feats.dtype),
                    feats.times, self.get_properties(feats))
        return out
