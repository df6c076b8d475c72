"""Base class for feature post-processors.

API-compatible with ``shennong/postprocessor/base.py`` of the
reference: a post-processor consumes Features and produces Features,
chaining provenance metadata in the properties.
"""

import abc
import copy

from shennong_tpu.processor.base import FeaturesProcessor


class FeaturesPostProcessor(FeaturesProcessor):
    """Base class of all features post-processors"""

    @abc.abstractmethod
    def process(self, features):
        """Return new features post-processed from input ``features``"""

    def get_properties(self, features):
        properties = copy.deepcopy(features.properties)
        properties[self.name] = self.get_params()

        if 'pipeline' not in properties:
            properties['pipeline'] = []

        properties['pipeline'].append({
            'name': self.name,
            'columns': [0, self.ndims - 1]})

        return properties
