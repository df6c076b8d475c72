"""Universal Background Model: diagonal-covariance GMM trainer.

API-compatible with ``shennong/processor/ubm.py`` (the port of Kaldi's
gmm-global-* tools), with every per-frame C++ loop replaced by the
batched linear algebra of :mod:`shennong_tpu.ops.gmm`: EM accumulation
is two matmuls per utterance, gaussian selection is a top-k, and all
statistics are associative reductions (multi-device training shards
utterances and psums the stats).

Representation difference versus the reference: the model is a plain
``DiagGmm`` dataclass of numpy arrays (weights, means, inv_vars)
rather than a pykaldi object; save/load uses npz instead of the Kaldi
binary format. Gaussian selection and posteriors are stored as dense
``[nframes, num_gselect]`` index/value arrays per utterance instead of
nested Python lists.
"""

import copy
import os

import numpy as np

import jax.numpy as jnp

from shennong_tpu import pipeline, FeaturesCollection
from shennong_tpu.base import BaseProcessor
from shennong_tpu.logger import null_logger
from shennong_tpu.ops import gmm as gmm_ops
from shennong_tpu.postprocessor.cmvn import SlidingWindowCmvnPostProcessor
from shennong_tpu.postprocessor.vad import VadPostProcessor


class DiagGmm:
    """A diagonal-covariance GMM: weights [G], means [G, D],
    inv_vars [G, D]."""

    def __init__(self, weights, means, inv_vars):
        self.weights = np.asarray(weights, dtype=np.float64)
        self.means = np.asarray(means, dtype=np.float64)
        self.inv_vars = np.asarray(inv_vars, dtype=np.float64)

    def num_gauss(self):
        return self.weights.shape[0]

    def dim(self):
        return self.means.shape[1]

    def get_means(self):
        return self.means

    def as_jax(self):
        return (jnp.asarray(self.weights, dtype=jnp.float32),
                jnp.asarray(self.means, dtype=jnp.float32),
                jnp.asarray(self.inv_vars, dtype=jnp.float32))


class DiagUbmProcessor(BaseProcessor):
    """Universal Background Model with Diagonal GMM"""

    def __init__(self, num_gauss,
                 num_iters=4, num_gselect=15, initial_gauss_proportion=0.5,
                 num_iters_init=20, num_frames=500000,
                 subsample=5, min_gaussian_weight=1e-4,
                 remove_low_count_gaussians=False, seed=0,
                 features=None, vad=None):
        super().__init__()

        self.num_gauss = num_gauss
        self.num_iters = num_iters
        self.num_iters_init = num_iters_init
        self.num_gselect = num_gselect
        self.initial_gauss_proportion = initial_gauss_proportion
        self.num_frames = num_frames
        self.subsample = subsample
        self.min_gaussian_weight = min_gaussian_weight
        self.remove_low_count_gaussians = remove_low_count_gaussians
        self.seed = seed

        if vad is None:
            config = VadPostProcessor().get_params()
            config['energy_threshold'] = 5.5
            self.vad = config
        else:
            self.vad = vad

        if features in (None, 'default'):
            config = pipeline.get_default_config('mfcc', with_delta=True)
            config['sliding_window_cmvn'] = (
                SlidingWindowCmvnPostProcessor().get_params())
            config['sliding_window_cmvn']['cmn_window'] = 300
            config['delta']['window'] = 3
            self.features = config
        else:
            self.features = features

        self.gmm = None
        self.selection = None

    @property
    def name(self):
        """Processor name"""
        return 'ubm'

    @property
    def num_gauss(self):
        """Number of Gaussians in the model"""
        return self._num_gauss

    @num_gauss.setter
    def num_gauss(self, value):
        if int(value) < 2:
            raise ValueError(
                'Number of gaussians must be at least 2, not {}'
                .format(value))
        self._num_gauss = int(value)

    @property
    def num_iters(self):
        """Number of iterations of training."""
        return self._num_iters

    @num_iters.setter
    def num_iters(self, value):
        self._num_iters = int(value)

    @property
    def num_iters_init(self):
        """ Number of E-M iterations for model initialization."""
        return self._num_iters_init

    @num_iters_init.setter
    def num_iters_init(self, value):
        self._num_iters_init = int(value)

    @property
    def num_gselect(self):
        """Number of Gaussians per frame to limit computation to, for speed."""
        return self._num_gselect

    @num_gselect.setter
    def num_gselect(self, value):
        self._num_gselect = int(value)

    @property
    def initial_gauss_proportion(self):
        """Proportion of Gaussians to start with in initialization phase
        (then split)"""
        return self._initial_gauss_proportion

    @initial_gauss_proportion.setter
    def initial_gauss_proportion(self, value):
        self._initial_gauss_proportion = float(value)

    @property
    def num_frames(self):
        """Maximum num-frames to keep in memory for model initialization."""
        return self._num_frames

    @num_frames.setter
    def num_frames(self, value):
        self._num_frames = int(value)

    @property
    def subsample(self):
        """In main E-M phase, use every n frames (a speedup)"""
        return self._subsample

    @subsample.setter
    def subsample(self, value):
        self._subsample = int(value)

    @property
    def min_gaussian_weight(self):
        """Minimum weight below which a Gaussian is not updated"""
        return np.float32(self._min_gaussian_weight)

    @min_gaussian_weight.setter
    def min_gaussian_weight(self, value):
        self._min_gaussian_weight = float(value)

    @property
    def remove_low_count_gaussians(self):
        """Remove Gaussians with a weight below `min_gaussian_weight`"""
        return self._remove_low_count_gaussians

    @remove_low_count_gaussians.setter
    def remove_low_count_gaussians(self, value):
        self._remove_low_count_gaussians = bool(value)

    @property
    def features(self):
        """Features extraction configuration"""
        return self._features

    @features.setter
    def features(self, value):
        if not isinstance(value, dict):
            raise TypeError('Features configuration must be a dict')
        if 'mfcc' not in value:
            raise ValueError('Need mfcc features to train UBM-GMM')
        self._features = copy.deepcopy(value)

    @property
    def vad(self):
        """VAD configuration for the UBM-GMM"""
        return self._vad

    @vad.setter
    def vad(self, value):
        if not isinstance(value, dict):
            raise TypeError('VAD configuration must be a dict')
        vad_keys = VadPostProcessor().get_params().keys()
        if not value.keys() <= vad_keys:
            raise ValueError('Unknown parameters given for VAD config')
        self._vad = copy.deepcopy(value)

    @property
    def seed(self):
        """Random seed for initialization from random frames"""
        return self._seed

    @seed.setter
    def seed(self, value):
        self._seed = int(value)
        self._rng = np.random.RandomState(seed=self._seed)

    @classmethod
    def load(cls, path):
        """Load a GMM checkpoint.

        Accepts both this package's npz format and Kaldi's binary
        DiagGmm (as written by the reference and by Kaldi tools like
        gmm-global-init-from-feats); the format is sniffed from the
        file header.
        """
        if not os.path.isfile(path):
            raise OSError('{}: file not found'.format(path))

        from shennong_tpu import kaldiio
        if kaldiio.is_kaldi_binary(path):
            gmm = DiagGmm(*kaldiio.read_diag_gmm(path))
        else:
            with np.load(path) as data:
                gmm = DiagGmm(
                    data['weights'], data['means'], data['inv_vars'])
        # the device EM treats exact-zero-weight zero-occupancy
        # components as inert shape padding (ops/gmm.py em_step); a
        # loaded model containing a real zero-weight component would
        # be silently frozen instead of floored, so reject it here
        # (Kaldi itself never produces exact-zero weights)
        if np.any(gmm.weights == 0):
            raise ValueError(
                '{}: GMM contains zero-weight components'.format(path))
        ubm = DiagUbmProcessor(gmm.num_gauss())
        ubm.gmm = gmm
        return ubm

    def save(self, path):
        """Save the GMM to an npz checkpoint"""
        if os.path.isfile(path):
            raise OSError('{}: file already exists'.format(path))
        if not isinstance(self.gmm, DiagGmm):
            raise TypeError('GMM not initialized')
        # through an open file object: np.savez(path) silently
        # appends '.npz' to other extensions, breaking the
        # round-trip and the exists guard above
        with open(path, 'wb') as fp:
            np.savez(
                fp, weights=self.gmm.weights, means=self.gmm.means,
                inv_vars=self.gmm.inv_vars)

    def save_kaldi(self, path):
        """Save the GMM in Kaldi's binary DiagGmm format (readable by
        Kaldi tools and by the reference's pykaldi loader)."""
        if os.path.isfile(path):
            raise OSError('{}: file already exists'.format(path))
        if not isinstance(self.gmm, DiagGmm):
            raise TypeError('GMM not initialized')
        from shennong_tpu import kaldiio
        kaldiio.write_diag_gmm(
            path, self.gmm.weights, self.gmm.means, self.gmm.inv_vars)

    def initialize_gmm(self, feats_collection, njobs=1):
        """Initialize the GMM and run the initial EM with splitting.

        Means start from randomly sampled frames (reservoir sampling
        bounded by ``num_frames``), variances from the global data
        variance; EM iterations interleave with component splitting up
        to ``num_gauss``.
        """
        num_gauss_init = int(
            self.initial_gauss_proportion * self.num_gauss)
        self.log.info('Initializing model')
        self.log.debug(
            'Starting from %s gaussians, reaching %s in %s iterations',
            num_gauss_init, self.num_gauss, self.num_iters_init)

        # reservoir-sample at most num_frames frames
        self.log.debug('Reading features')
        all_feats = np.concatenate(
            [feats.data for feats in feats_collection.values()], axis=0)
        num_read = all_feats.shape[0]
        if num_read > self.num_frames:
            # faithful reservoir semantics: uniform subset
            chosen = self._reservoir_indices(num_read)
            feats = all_feats[chosen]
            self.log.debug(
                'Kept %s out of %s input frames = %s %%',
                self.num_frames, num_read,
                100 * self.num_frames / num_read)
        else:
            feats = all_feats
            self.log.debug(
                'Number of frames read %s was less than'
                ' target number %s, using all we read',
                num_read, self.num_frames)

        self._init_from_random_frames(feats, num_gauss_init)
        self._init_em_loop(
            jnp.asarray(feats, dtype=jnp.float32),
            jnp.ones(feats.shape[0], dtype=jnp.float32),
            num_gauss_init, feats.shape[0])

    def _init_em_loop(self, feats_dev, weights_dev, num_gauss_init,
                      nframes_log, em_fn=None, accumulate_fn=None):
        """The init EM-with-splitting loop on device-resident data.

        ``weights_dev`` holds 0/1 per-frame selection weights (1 for
        every sampled frame), so the same loop serves the host path
        (all rows real) and the fully device-resident path (voiced
        frames marked within the padded flat matrix).

        ``em_fn(params, num_iters) -> (tot_like, weights, means,
        inv_vars)`` overrides how the EM iterations between splits
        execute — the multi-process trainer
        (:func:`shennong_tpu.parallel.distributed.train_ubm`) plugs in
        a mesh-sharded step whose statistics psum across hosts; the
        default runs on the local device data.

        ``accumulate_fn(params) -> (tot_like, occupancy, mean_acc,
        var_acc)`` overrides statistic accumulation for the
        ``remove_low_count_gaussians`` path, whose component-removing
        MLE update always runs on the host (shapes shrink); a
        distributed caller supplies psum'd statistics so every
        process takes identical removal decisions in lockstep.
        """
        cur_num_gauss = num_gauss_init
        gauss_inc = int((self.num_gauss - num_gauss_init)
                        / (max(self.num_iters_init, 1) / 2))
        if gauss_inc == 0:
            self.log.warning(
                'Number of gaussians %s is too low', self.num_gauss)
            gauss_inc = 1

        # the data and the model stay device-resident across the EM
        # iterations: one em_step program per iteration, host fetches
        # only around the splits. The model is padded to the FINAL
        # component count from the start — weight-zero components are
        # numerically inert (log 0 = -inf kills their posteriors) and
        # keep every program at one compiled shape instead of
        # recompiling on each of the ~4 splits
        def pad_params(weights, means, inv_vars):
            short = self.num_gauss - weights.shape[0]
            if short <= 0:
                return DiagGmm(weights, means, inv_vars).as_jax()
            dim = means.shape[1]
            return DiagGmm(
                np.concatenate([weights, np.zeros(short)]),
                np.concatenate([means, np.zeros((short, dim))]),
                np.concatenate([inv_vars, np.ones((short, dim))]),
            ).as_jax()

        # the reference applies the user's remove_low_count_gaussians
        # option on EVERY init iteration (its init loop passes
        # self._options to mle_diag_gmm_update, reference
        # ubm.py:361-365) — removal changes the component count, so
        # that configuration runs its updates host-side (accumulation
        # stays one device program per iteration)
        remove = bool(self.remove_low_count_gaussians)
        if remove and em_fn is not None and accumulate_fn is None:
            raise ValueError(
                'remove_low_count_gaussians with a custom em_fn '
                'requires a matching accumulate_fn (the removal '
                'update runs host-side on its statistics)')
        if remove and accumulate_fn is None:
            def accumulate_fn(params):
                return gmm_ops.accumulate_stats(
                    feats_dev, weights_dev, *params)

        ones_dev = weights_dev
        if em_fn is None:
            def em_fn(params, num_iters):
                if num_iters == 1:
                    return gmm_ops.em_step(
                        feats_dev, ones_dev, *params,
                        min_gaussian_weight=self._min_gaussian_weight)
                return gmm_ops.em_steps(
                    feats_dev, ones_dev, *params, num_iters=num_iters,
                    min_gaussian_weight=self._min_gaussian_weight)

        params = pad_params(
            self.gmm.weights, self.gmm.means, self.gmm.inv_vars)
        live = num_gauss_init   # actual components (removal shrinks)
        i = 0
        while i < self.num_iters_init:
            if remove:
                if self.log.isEnabledFor(10):
                    self.log.debug('Iteration %s', i)
                tot_like, occ, macc, vacc = accumulate_fn(params)
                new = gmm_ops.mle_update(
                    np.asarray(occ, dtype=np.float64)[:live],
                    np.asarray(macc, dtype=np.float64)[:live],
                    np.asarray(vacc, dtype=np.float64)[:live],
                    np.asarray(params[0], dtype=np.float64)[:live],
                    np.asarray(params[1], dtype=np.float64)[:live],
                    np.asarray(params[2], dtype=np.float64)[:live],
                    min_gaussian_weight=self._min_gaussian_weight,
                    remove_low_count_gaussians=True)
                if new[0].shape[0] < live:
                    self.log.debug(
                        'Removed %s low-count Gaussians during '
                        'initialization', live - new[0].shape[0])
                live = new[0].shape[0]
                params = pad_params(*new)
                i += 1
            elif cur_num_gauss >= self.num_gauss:
                # no more splits ahead: fuse every remaining iteration
                # into one device program
                run = self.num_iters_init - i
                if self.log.isEnabledFor(10):  # logging.DEBUG
                    self.log.debug('Iterations %s..%s (fused)',
                                   i, self.num_iters_init - 1)
                tot_like, *params = em_fn(params, run)
                i += run
            else:
                if self.log.isEnabledFor(10):
                    self.log.debug('Iteration %s', i)
                tot_like, *params = em_fn(params, 1)
                i += 1
            if self.log.isEnabledFor(10):
                self.log.debug(
                    'Likelihood per frame: %s over %s frames',
                    float(tot_like) / max(nframes_log, 1), nframes_log)

            next_num_gauss = min(
                self.num_gauss, cur_num_gauss + gauss_inc)
            if next_num_gauss > live:
                self.log.debug(
                    'Splitting to %s Gaussians', next_num_gauss)
                split = gmm_ops.split_gmm(
                    np.asarray(params[0], dtype=np.float64)[:live],
                    np.asarray(params[1], dtype=np.float64)[:live],
                    np.asarray(params[2], dtype=np.float64)[:live],
                    next_num_gauss, 0.1, self._rng)
                params = pad_params(*split)
                live = next_num_gauss
                cur_num_gauss = next_num_gauss
        self.gmm = DiagGmm(
            np.asarray(params[0], dtype=np.float64)[:live],
            np.asarray(params[1], dtype=np.float64)[:live],
            np.asarray(params[2], dtype=np.float64)[:live])

    def _reservoir_indices(self, num_read):
        """Frame indices kept by the reference's reservoir sampling."""
        kept = np.arange(self.num_frames)
        for row in range(self.num_frames, num_read):
            if self._rng.random_sample() <= self.num_frames / (row + 1):
                kept[self._rng.randint(0, self.num_frames)] = row
        return kept

    def _init_from_random_frames(self, feats, num_gauss):
        """Means from random distinct frames, variance from the data."""
        num_frames, dim = feats.shape
        if num_frames < 10 * num_gauss:
            raise ValueError(
                f'Too few frames to train on ({num_frames} frames)')

        feats64 = feats.astype(np.float64)
        mean = feats64.mean(axis=0)
        var = (feats64 ** 2).mean(axis=0) - mean ** 2
        if var.max() <= 0:
            raise ValueError(
                f'Features do not have positive variance {var}')

        chosen = self._rng.choice(num_frames, num_gauss, replace=False)
        self.gmm = DiagGmm(
            np.full(num_gauss, 1.0 / num_gauss),
            feats64[chosen],
            np.tile(1.0 / var, (num_gauss, 1)))

    def initialize_gmm_device(self, flat, w_init, num_read):
        """Initialize and run the init EM on device-resident data.

        The device twin of :func:`initialize_gmm`: ``flat`` is the
        padded [N, D] float32 feature matrix, ``w_init`` the 0/1
        voiced-frame weights, ``num_read`` their (host) total. The
        reservoir subset, the random-frame means and the data variance
        all come from device gathers/reductions — only O(num_gauss)
        values ever reach the host.
        """
        import jax

        num_gauss_init = int(
            self.initial_gauss_proportion * self.num_gauss)
        self.log.info('Initializing model')

        total_rows = flat.shape[0]
        # voiced rows first, in original order (stable by index)
        order = jnp.argsort(
            jnp.arange(total_rows)
            + (1 - w_init.astype(jnp.int32)) * total_rows)

        if num_read > self.num_frames:
            kept = self._reservoir_indices(num_read)
            rows_kept = jnp.take(order, jnp.asarray(kept))
            weights = jnp.zeros(total_rows, jnp.float32)
            weights = weights.at[rows_kept].set(1.0)
            avail = self.num_frames
            self.log.debug(
                'Kept %s out of %s input frames = %s %%',
                self.num_frames, num_read,
                100 * self.num_frames / num_read)
        else:
            kept = None
            weights = w_init
            avail = num_read

        if avail < 10 * num_gauss_init:
            raise ValueError(
                f'Too few frames to train on ({avail} frames)')

        kwargs = dict(
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        sums = jnp.einsum('nd,n->d', flat, weights, **kwargs)
        sqsums = jnp.einsum('nd,nd,n->d', flat, flat, weights, **kwargs)
        mean = np.asarray(sums, dtype=np.float64) / avail
        var = np.asarray(sqsums, dtype=np.float64) / avail - mean ** 2
        if var.max() <= 0:
            raise ValueError(
                f'Features do not have positive variance {var}')

        chosen = self._rng.choice(avail, num_gauss_init, replace=False)
        if kept is not None:
            rows_chosen = jnp.take(order, jnp.asarray(kept[chosen]))
        else:
            rows_chosen = jnp.take(order, jnp.asarray(chosen))
        means0 = np.asarray(
            jnp.take(flat, rows_chosen, axis=0), dtype=np.float64)
        self.gmm = DiagGmm(
            np.full(num_gauss_init, 1.0 / num_gauss_init),
            means0,
            np.tile(1.0 / var, (num_gauss_init, 1)))

        self._init_em_loop(flat, weights, num_gauss_init, avail)

    @staticmethod
    def _flat_frames(feats_collection):
        """Concatenate a collection on the frame axis, padded to a
        bucket: GMM per-frame operations are independent of utterance
        boundaries, so the whole collection runs as ONE device program
        (padding rows carry zero weight / are sliced away).

        Returns (names, counts, padded feats [N', D] float32, nrows).
        """
        from shennong_tpu.ops.framing import bucket_size

        names = list(feats_collection.keys())
        counts = [feats_collection[n].nframes for n in names]
        nrows = int(sum(counts))
        bucket = bucket_size(max(nrows, 1), minimum=128)
        dim = feats_collection[names[0]].ndims
        flat = np.zeros((bucket, dim), dtype=np.float32)
        offset = 0
        for name, count in zip(names, counts):
            flat[offset:offset + count] = feats_collection[name].data
            offset += count
        return names, counts, flat, nrows

    def gaussian_selection(self, feats_collection):
        """Select the ``num_gselect`` best components per frame.

        Stores per-utterance [nframes, num_gselect] index arrays in
        ``self.selection``; the whole collection runs as one device
        program (frame-independent top-k).
        """
        if not isinstance(self.gmm, DiagGmm):
            raise TypeError('GMM not initialized')

        already = self.selection is not None
        if not already:
            self.selection = {}

        if self.num_gselect > self.gmm.num_gauss():
            self.log.warning(
                'You asked for %s Gaussians but GMM only has %s,'
                ' returning this many. Note: this means the'
                ' Gaussian selection is pointless',
                self.num_gselect, self.gmm.num_gauss())
            self.num_gselect = self.gmm.num_gauss()

        if already:
            for utt in feats_collection.keys():
                if utt not in self.selection:
                    raise ValueError(
                        f'No gselect information for utterance {utt}')

        weights, means, inv_vars = self.gmm.as_jax()
        names, counts, flat, nrows = self._flat_frames(feats_collection)
        if already:
            # refine within the previous per-frame subset (Kaldi
            # gmm-gselect --gselect semantics, reference
            # shennong/processor/ubm.py:472-480)
            prev = []
            for name, count in zip(names, counts):
                sel = np.asarray(self.selection[name])
                if sel.shape[0] != count:
                    raise ValueError(
                        f'Input gselect utterance {name} has wrong '
                        f'size')
                prev.append(sel)
            prev = np.concatenate(prev) if prev else np.zeros(
                (0, self.num_gselect), np.int32)
            prev = np.pad(
                prev, ((0, flat.shape[0] - nrows), (0, 0)))
            like, indices = gmm_ops.gaussian_selection_preselect(
                jnp.asarray(flat), jnp.asarray(prev), weights, means,
                inv_vars, min(self.num_gselect, prev.shape[1]))
        else:
            like, indices = gmm_ops.gaussian_selection(
                jnp.asarray(flat), weights, means, inv_vars,
                self.num_gselect)
        indices = np.asarray(indices[:nrows])
        offset = 0
        for name, count in zip(names, counts):
            self.selection[name] = indices[offset:offset + count]
            offset += count

        if self.log.isEnabledFor(10):  # logging.DEBUG
            # per-frame likelihoods so bucket-padding rows do not
            # bias the diagnostic
            total = float(np.asarray(like[:nrows]).sum())
            self.log.debug(
                'Done %s utterances, mean UBM log-likelihood is %s over '
                '%s frames', len(feats_collection),
                total / max(nrows, 1), nrows)

    def gaussian_selection_to_post(self, feats_collection,
                                   min_post=None):
        """Per-frame posteriors over the selected components.

        Returns a dict utterance -> (indices [nframes, k], posteriors
        [nframes, k]); posteriors below ``min_post`` are pruned and
        the rest renormalized.
        """
        if not isinstance(self.selection, dict):
            raise ValueError('Gaussian selection has not been done')

        for utt in feats_collection.keys():
            if utt not in self.selection:
                raise ValueError(
                    f'No gselect information for utterance {utt}')
            if (self.selection[utt].shape[0]
                    != feats_collection[utt].nframes):
                raise ValueError(
                    f'Input gselect utterance {utt} has wrong size '
                    f'{self.selection[utt].shape[0]} vs '
                    f'{feats_collection[utt].nframes}')

        # one device program over the concatenated collection
        weights, means, inv_vars = self.gmm.as_jax()
        names, counts, flat, nrows = self._flat_frames(feats_collection)
        num_sel = self.selection[names[0]].shape[1]
        idx_flat = np.zeros((flat.shape[0], num_sel), dtype=np.int32)
        offset = 0
        for name, count in zip(names, counts):
            idx_flat[offset:offset + count] = self.selection[name]
            offset += count
        norm, post_flat = gmm_ops.posteriors_preselect(
            jnp.asarray(flat), jnp.asarray(idx_flat),
            weights, means, inv_vars)
        post_flat = np.asarray(post_flat[:nrows], dtype=np.float64)

        if min_post is not None:
            post_flat = _prune_min_post(post_flat, min_post)

        posteriors = {}
        offset = 0
        for name, count in zip(names, counts):
            posteriors[name] = (
                self.selection[name], post_flat[offset:offset + count])
            offset += count

        if self.log.isEnabledFor(10):  # logging.DEBUG
            self.log.debug(
                'Overall likelihood per frame is %s over %s frames',
                float(jnp.sum(norm[:nrows])) / max(nrows, 1), nrows)
        return posteriors

    def accumulate(self, feats_collection, weights_collection=None,
                   njobs=1):
        """Accumulate EM statistics over a features collection.

        Returns (occupancy, mean_acc, var_acc) numpy arrays; the
        reduction over utterances is associative (a psum across
        devices in the distributed path).
        """
        if not isinstance(self.gmm, DiagGmm):
            raise TypeError('GMM not initialized')

        dim = self.gmm.dim()
        for utt, feats in feats_collection.items():
            if feats.ndims != dim:
                raise ValueError(
                    f'Features from utterance {utt} have wrong'
                    f' dims {feats.ndims}, instead of {dim}')

        if weights_collection is not None:
            if weights_collection.keys() != feats_collection.keys():
                raise ValueError(
                    'Keys differ between weights and features '
                    'collections')
            for utt, weights in weights_collection.items():
                if weights.shape[0] != feats_collection[utt].nframes:
                    raise ValueError(
                        f'Wrong size for weights on utterance {utt}')

        # one device program over the concatenated collection
        # (zero-weight padding rows keep the statistics exact)
        jweights, jmeans, jinv = self.gmm.as_jax()
        names, counts, flat, nrows = self._flat_frames(feats_collection)
        flat_weights = np.zeros(flat.shape[0], dtype=np.float32)
        offset = 0
        for name, count in zip(names, counts):
            if weights_collection is None:
                flat_weights[offset:offset + count] = 1.0
            else:
                flat_weights[offset:offset + count] = np.asarray(
                    weights_collection[name], dtype=np.float32)
            offset += count

        like, occ, mean_acc, var_acc = gmm_ops.accumulate_stats(
            jnp.asarray(flat), jnp.asarray(flat_weights),
            jweights, jmeans, jinv)

        if self.log.isEnabledFor(10):  # logging.DEBUG
            tot_weight = float(flat_weights.sum())
            self.log.debug(
                'Overall likelihood per frame = %s over %s weighted '
                'frames', float(like) / max(tot_weight, 1e-10),
                tot_weight)
        return (np.asarray(occ, dtype=np.float64),
                np.asarray(mean_acc, dtype=np.float64),
                np.asarray(var_acc, dtype=np.float64))

    def estimate(self, gmm_accs, mixup=None, perturb_factor=0.01):
        """Re-estimate the GMM from accumulated statistics."""
        if not isinstance(self.gmm, DiagGmm):
            raise TypeError('GMM not initialized')
        if mixup is not None and mixup <= self.num_gauss:
            raise ValueError(
                'Mixup parameter must be greater than the number of '
                'gaussians')

        occ, mean_acc, var_acc = gmm_accs
        new = gmm_ops.mle_update(
            occ, mean_acc, var_acc, self.gmm.weights, self.gmm.means,
            self.gmm.inv_vars,
            min_gaussian_weight=self._min_gaussian_weight,
            remove_low_count_gaussians=self._remove_low_count_gaussians)
        self.gmm = DiagGmm(*new)

        if mixup is not None:
            self.gmm = DiagGmm(*gmm_ops.split_gmm(
                self.gmm.weights, self.gmm.means, self.gmm.inv_vars,
                int(mixup), perturb_factor, self._rng))

    def _frontend_device(self, utterances, njobs=1):
        """Fully device-resident feature front-end, or None.

        Streams the corpus through :func:`stream_frontend`, keeping
        every feature on the device. The staged host path
        round-tripped the corpus through the host-device link four
        times. Returns (flat [N, D], w_init [N], w_em [N] — device
        arrays — and the host int voiced count), or None when the
        configuration needs the staged path (non-MFCC features,
        hour-scale utterances).
        """
        front = stream_frontend(
            self.features, self.vad, self.subsample, utterances,
            njobs=njobs,
            signal_cache=getattr(self, '_signal_cache', None))
        if front is None:
            return None
        flat, w_init, w_em, num_read, layout = front
        if getattr(self, '_retain_frontend', False):
            # a VTLN trainer with an identical feature configuration
            # reuses this front-end pass instead of re-streaming the
            # corpus (opt-in: plain UBM training must not pin the
            # flat feature matrix in device memory past training)
            self._frontend_result = (
                flat, w_init, w_em, num_read, layout)
        return flat, w_init, w_em, num_read

    def _staged_frontend(self, utterances, njobs=1):
        """The batched-but-staged front-end (extract, VAD, sliding
        CMVN as separate corpus sweeps). Fallback for configurations
        the fused program does not cover; returns the device-resident
        (flat feats [N, D], 0/1 weights [N]) for the main EM."""
        # extraction must run without the sliding CMVN; restore the
        # configuration even when a stage raises so a retried
        # processor keeps the parameters the user set
        cmvn_config = self.features.pop('sliding_window_cmvn', None)
        try:
            raw_features = pipeline.extract_features(
                self.features, utterances, njobs=njobs,
                log=null_logger())
        finally:
            if cmvn_config is not None:
                self.features['sliding_window_cmvn'] = cmvn_config

        # batched VAD decisions (O(buckets) device programs)
        vad = {
            utt: decision.data.reshape(-1).astype(bool)
            for utt, decision in VadPostProcessor(
                **self.vad).process_all(raw_features).items()}

        # batched sliding-window normalization
        if cmvn_config is not None:
            features = SlidingWindowCmvnPostProcessor(
                **cmvn_config).process_all(raw_features)
        else:
            features = raw_features

        features = features.trim(vad)

        self.initialize_gmm(features, njobs=njobs)
        self.log.info('Training for %s iterations', self.num_iters)
        features = FeaturesCollection({
            utt: feats.copy(subsample=self.subsample)
            for utt, feats in features.items()})

        names, counts, flat, nrows = self._flat_frames(features)
        flat_weights = np.zeros(flat.shape[0], dtype=np.float32)
        flat_weights[:nrows] = 1.0
        return jnp.asarray(flat), jnp.asarray(flat_weights)

    def process(self, utterances, njobs=1):
        """Train the UBM-GMM on the given utterances.

        Extracts the configured features (MFCC + delta + sliding
        CMVN), trims them with energy VAD, initializes the model and
        runs ``num_iters`` EM iterations.
        """
        self.log.info('Training UBM using %s jobs', njobs)
        front = self._frontend_device(utterances, njobs=njobs)
        if front is not None:
            feats_dev, w_init, weights_dev, num_read = front
            self.initialize_gmm_device(feats_dev, w_init, num_read)
            self.log.info(
                'Training for %s iterations', self.num_iters)
        else:
            feats_dev, weights_dev = self._staged_frontend(
                utterances, njobs=njobs)

        # main EM: data and model device-resident, one program per
        # iteration; the final iteration goes through the host update
        # when low-count components must be removed (shape change)
        params = self.gmm.as_jax()
        if self.num_iters > 0 and self.remove_low_count_gaussians:
            # all but the last iteration fused into one program; the
            # final one goes through the host update because component
            # removal changes shapes
            if self.num_iters > 1:
                _, *params = gmm_ops.em_steps(
                    feats_dev, weights_dev, *params,
                    num_iters=self.num_iters - 1,
                    min_gaussian_weight=self._min_gaussian_weight)
            _, occ, mean_acc, var_acc = gmm_ops.accumulate_stats(
                feats_dev, weights_dev, *params)
            self.gmm = DiagGmm(*[
                np.asarray(p, dtype=np.float64) for p in params])
            self.estimate((
                np.asarray(occ, dtype=np.float64),
                np.asarray(mean_acc, dtype=np.float64),
                np.asarray(var_acc, dtype=np.float64)))
        elif self.num_iters > 0:
            _, *params = gmm_ops.em_steps(
                feats_dev, weights_dev, *params,
                num_iters=self.num_iters,
                min_gaussian_weight=self._min_gaussian_weight)
            self.gmm = DiagGmm(*[
                np.asarray(p, dtype=np.float64) for p in params])
        self.log.info('Done training UBM.')


def _prune_min_post(post, min_post):
    """The reference's exact sequential min_post pruning
    (shennong/processor/ubm.py:559-568): component ``j`` is zeroed
    when its CURRENT — already renormalized — posterior falls under
    ``min_post``, and the frame renormalizes immediately after every
    component, so later components are tested against the grown
    values. A single global prune pass would differ: e.g.
    [0.35, 0.35, 0.30] at min_post 0.4 becomes [0, 0.538, 0.462]
    here (renormalizing after zeroing component 0 lifts the others
    over the threshold), not the all-pruned fallback. A frame losing
    all mass puts 1 on its pre-prune argmax.

    Vectorized over frames: one pass of vector ops per of the ~15
    selected components instead of the reference's per-frame python
    loops.
    """
    post = np.array(post, dtype=np.float64)
    best = post.argmax(axis=1)
    rows = np.arange(post.shape[0])
    for j in range(post.shape[1]):
        post[:, j] = np.where(post[:, j] < min_post, 0.0, post[:, j])
        totals = post.sum(axis=1)
        empty = totals == 0
        if empty.any():
            post[rows[empty], best[empty]] = 1.0
            totals[empty] = 1.0
        post /= totals[:, None]
    return post


def fused_frontend_supported(features_config, utterances):
    """True when :func:`stream_frontend` can serve this corpus.

    Mirrors the gating at the top of :func:`stream_frontend` (keep
    them in sync) without streaming anything. Multi-process trainers
    call this on the FULL collection before sharding: a per-shard
    gate could pass on one process and fail on another (e.g. an
    hour-scale utterance landing in one shard), and an asymmetric
    raise would leave the other processes blocked in a collective.
    """
    from shennong_tpu.audio import Audio
    from shennong_tpu.utterances import Utterances

    if 'mfcc' not in features_config:
        return False
    if set(features_config) - {'mfcc', 'delta', 'sliding_window_cmvn'}:
        return False
    utterances = list(utterances)
    if not utterances:
        return False
    rates = {
        Audio.scan(utt.audio_file).sample_rate for utt in utterances}
    if len(rates) != 1:
        return False

    config = {
        k: copy.deepcopy(v) for k, v in features_config.items()
        if k != 'sliding_window_cmvn'}
    config = pipeline.init_config(config, log=null_logger())
    manager = pipeline.PipelineManager(
        config, Utterances(utterances), log=null_logger())
    proc = manager.make('features', utterances[0])
    if proc.name != 'mfcc':
        return False
    limit = getattr(proc, 'AUTO_CHUNK_FRAMES', None)
    if limit:
        for utt in utterances:
            frames = proc.output_frames(
                int(utt.duration * float(proc.sample_rate)))
            if frames > limit:
                return False
    return True


def stream_frontend(features_config, vad_params, subsample,
                    utterances, njobs=1, batch_size=64,
                    signal_cache=None):
    """Device-resident GMM-training feature front-end.

    Streams the corpus and runs one fused program per signal batch
    (:func:`shennong_tpu.parallel.fused.ubm_frontend_program` — MFCC,
    deltas, energy VAD, sliding CMVN and the trim/subsample frame
    selection weights), keeping every feature on the device. Shared
    by the UBM trainer and the LVTLN trainer (the reference runs the
    same front-end in both, ``shennong/processor/ubm.py:714-772`` and
    ``vtln.py:511-664``).

    Returns None when the configuration needs the staged path
    (non-MFCC features, hour-scale utterances), else a tuple
    (flat [N, D], w_init [N], w_em [N] — float32 device arrays, rows
    beyond each utterance's voiced frames carrying zero weight —
    num_read: host int count of voiced frames, layout: list of
    (names, frames_per_row, row_offset) mapping each batch's flat
    rows back to utterances).
    """
    import jax

    from shennong_tpu.ops.framing import bucket_size, num_frames
    from shennong_tpu.parallel import stream as streaming
    from shennong_tpu.parallel.executor import _check_sample_rates
    from shennong_tpu.parallel.fused import ubm_frontend_program
    from shennong_tpu.processor.base import _fresh_key
    from shennong_tpu.utterances import Utterances

    # the fused program computes exactly MFCC (+delta, +sliding
    # CMVN); any other configured stage (pitch, per-speaker CMVN,
    # vtln, ...) must take the staged path or it would be silently
    # dropped from the training features
    if 'mfcc' not in features_config:
        return None
    if set(features_config) - {'mfcc', 'delta', 'sliding_window_cmvn'}:
        return None
    if not isinstance(utterances, Utterances):
        utterances = Utterances(utterances)
    utterances = list(utterances)

    # mixed-sample-rate corpora need per-utterance processors
    from shennong_tpu.audio import Audio
    rates = {
        Audio.scan(utt.audio_file).sample_rate for utt in utterances}
    if len(rates) != 1:
        return None

    config = {
        k: copy.deepcopy(v) for k, v in features_config.items()
        if k != 'sliding_window_cmvn'}
    config = pipeline.init_config(config, log=null_logger())
    manager = pipeline.PipelineManager(
        config, Utterances(utterances), log=null_logger())
    first = utterances[0]
    proc = manager.make('features', first)
    if proc.name != 'mfcc':
        return None
    limit = getattr(proc, 'AUTO_CHUNK_FRAMES', None)
    if limit:
        for utt in utterances:
            frames = proc.output_frames(
                int(utt.duration * float(proc.sample_rate)))
            if frames > limit:
                return None
    _check_sample_rates(utterances, proc)

    delta_order = delta_window = None
    if 'delta' in config:
        dproc = manager.make('delta')
        delta_order, delta_window = dproc.order, dproc.window

    vproc = VadPostProcessor(**vad_params)
    vad_opts = (
        vproc.energy_threshold, vproc.energy_mean_scale,
        vproc.frames_context, vproc.proportion_threshold)

    cmvn_opts = None
    cmvn_config = features_config.get('sliding_window_cmvn')
    if cmvn_config is not None:
        cproc = SlidingWindowCmvnPostProcessor(**cmvn_config)
        cmvn_opts = (
            bool(cproc.center), int(cproc.cmn_window),
            int(cproc.min_window), bool(cproc.normalize_variance))

    mel = jnp.asarray(proc.mel_weights(1.0))
    opts = proc.options()
    frame_opts = proc.frame_options()

    feats_parts, winit_parts, wem_parts = [], [], []
    layout, offset = [], 0
    pending, num_read = [], 0

    def drain_one():
        # the count output depends on the batch's whole upload, so
        # fetching it proves the decode buffer is consumed; draining
        # two batches behind keeps the pool fed (bounded host memory)
        # without stalling the dispatch pipeline
        nonlocal num_read
        signals_done, count_done = pending.pop(0)
        num_read += int(np.asarray(count_done))
        streaming.recycle(signals_done)

    # pad batches to the same multiple a BatchExecutor would (the
    # default mesh's device count): the VTLN flow's warp-moment pass
    # streams through an executor, and the SignalCache keys on the
    # pad multiple — mismatched multiples would re-decode and
    # re-upload the corpus for that pass. Padding rows are inert
    # here (zero frames -> zero weight, see below)
    from shennong_tpu.parallel import mesh as meshing
    default_mesh = meshing.get_default_mesh()
    pad_to_multiple = (
        default_mesh.devices.size if default_mesh is not None else 1)
    source = streaming.stream_source(
        signal_cache, utterances, batch_size, pad_to_multiple,
        njobs=njobs)
    for names, signals, nsamples, nvalid in source:
        nframes_max = num_frames(signals.shape[1], frame_opts)
        key = _fresh_key() if frame_opts.dither != 0 else None
        feats, w_init, w_em, count = ubm_frontend_program(
            jax.device_put(signals), jax.device_put(nsamples),
            mel, opts, nframes_max, delta_order, delta_window,
            vad_opts, cmvn_opts, subsample, key=key)
        # padding rows have zero frames, hence zero weight: flat
        # rows beyond the voiced set are inert everywhere
        frames_per_row = feats.shape[1]
        feats_parts.append(feats.reshape(-1, feats.shape[-1]))
        winit_parts.append(w_init.reshape(-1))
        wem_parts.append(w_em.reshape(-1))
        layout.append((list(names), frames_per_row, offset))
        offset += signals.shape[0] * frames_per_row
        pending.append((signals, count))
        if len(pending) > 2:
            drain_one()
    while pending:
        drain_one()

    flat = jnp.concatenate(feats_parts, axis=0)
    w_init = jnp.concatenate(winit_parts, axis=0)
    w_em = jnp.concatenate(wem_parts, axis=0)
    nrows = flat.shape[0]
    bucket = bucket_size(max(nrows, 1), minimum=128)
    if bucket > nrows:
        flat = jnp.pad(flat, ((0, bucket - nrows), (0, 0)))
        w_init = jnp.pad(w_init, (0, bucket - nrows))
        w_em = jnp.pad(w_em, (0, bucket - nrows))
    return flat, w_init, w_em, num_read, layout
