"""VTLN warp factor estimation (linear VTLN).

API-compatible with ``shennong/processor/vtln.py`` (the port of
Kaldi's gmm-train-lvtln-special / gmm-global-est-lvtln-trans). The
expensive inner loops — per-warp least-squares base transforms, fMLLR
statistic accumulation, per-class objective evaluation — run as the
vectorized linear algebra of :mod:`shennong_tpu.ops.fmllr`; GMM
likelihoods come from :mod:`shennong_tpu.ops.gmm` on device.
"""

import copy
import os
import yaml

import numpy as np

from shennong_tpu import pipeline, FeaturesCollection, Features
from shennong_tpu.base import BaseProcessor
from shennong_tpu.logger import null_logger
from shennong_tpu.ops.fmllr import (
    FmllrStats, LinearVtln, compute_mapping_transform)
from shennong_tpu.processor.ubm import DiagUbmProcessor
from shennong_tpu.postprocessor.cmvn import SlidingWindowCmvnPostProcessor
from shennong_tpu.postprocessor.vad import VadPostProcessor


class VtlnProcessor(BaseProcessor):
    """VTLN model"""

    def __init__(self, num_iters=15, min_warp=0.85,
                 max_warp=1.25, warp_step=0.01,
                 logdet_scale=0.0, norm_type='offset',
                 subsample=5, features=None,
                 ubm=None, by_speaker=True):
        super().__init__()

        self.num_iters = num_iters
        self.min_warp = min_warp
        self.max_warp = max_warp
        self.warp_step = warp_step
        self.logdet_scale = logdet_scale
        self.norm_type = norm_type
        self.subsample = subsample
        self.by_speaker = by_speaker

        if features in (None, 'default'):
            config = pipeline.get_default_config('mfcc', with_delta=True)
            config['sliding_window_cmvn'] = (
                SlidingWindowCmvnPostProcessor().get_params())
            config['sliding_window_cmvn']['cmn_window'] = 300
            config['delta']['window'] = 3
            self.features = config
        else:
            self.features = features

        if ubm is None:
            self.ubm = DiagUbmProcessor(64).get_params()
        else:
            self.ubm = ubm

        self.lvtln = None
        self.transforms = None
        self.warps = None

    @property
    def name(self):
        return 'vtln'

    @property
    def num_iters(self):
        """How many LVTLN estimation rounds to run"""
        return self._num_iters

    @num_iters.setter
    def num_iters(self, value):
        self._num_iters = int(value)

    @property
    def min_warp(self):
        """Lower bound of the warp grid"""
        return self._min_warp

    @min_warp.setter
    def min_warp(self, value):
        self._min_warp = float(value)

    @property
    def max_warp(self):
        """Upper bound of the warp grid"""
        return self._max_warp

    @max_warp.setter
    def max_warp(self, value):
        self._max_warp = float(value)

    @property
    def warp_step(self):
        """Spacing between consecutive warp classes"""
        return self._warp_step

    @warp_step.setter
    def warp_step(self, value):
        self._warp_step = float(value)

    @property
    def logdet_scale(self):
        """Weight of the log-determinant in the fMLLR objective"""
        return self._logdet_scale

    @logdet_scale.setter
    def logdet_scale(self, value):
        self._logdet_scale = float(value)

    @property
    def norm_type(self):
        """Secondary fMLLR flavor: ``offset``, ``none`` or ``diag``"""
        return self._norm_type

    @norm_type.setter
    def norm_type(self, value):
        if value not in ['offset', 'none', 'diag']:
            raise ValueError('Invalid norm type {}'.format(value))
        self._norm_type = value

    @property
    def subsample(self):
        """Frame subsampling factor while fitting the base transforms"""
        return self._subsample

    @subsample.setter
    def subsample(self, value):
        self._subsample = int(value)

    @property
    def by_speaker(self):
        """Whether warps are shared per speaker or kept per utterance"""
        return self._by_speaker

    @by_speaker.setter
    def by_speaker(self, value):
        self._by_speaker = bool(value)

    @property
    def features(self):
        """Configuration dict of the MFCC features used internally"""
        return self._features

    @features.setter
    def features(self, value):
        if not isinstance(value, dict):
            raise TypeError(
                'Features extraction configuration must be a dict')
        if 'mfcc' not in value:
            raise ValueError('Need mfcc features to train VTLN model')
        self._features = copy.deepcopy(value)

    @property
    def ubm(self):
        "Diagonal UBM-GMM configuration"
        return self._ubm

    @ubm.setter
    def ubm(self, value):
        if not isinstance(value, dict):
            raise TypeError('UBM configuration must be a dict')
        ubm_keys = DiagUbmProcessor(2).get_params().keys()
        if not value.keys() <= ubm_keys:
            raise ValueError('Unknown parameters given for UBM config')
        self._ubm = copy.deepcopy(value)

    @classmethod
    def load(cls, path):
        """Load LVTLN transforms.

        Accepts both this package's npz format and Kaldi's binary
        LinearVtln (as written by the reference and by
        gmm-train-lvtln-special); the format is sniffed from the file
        header.
        """
        if not os.path.isfile(path):
            raise OSError('{}: file not found'.format(path))

        from shennong_tpu import kaldiio
        vtln = VtlnProcessor()
        if kaldiio.is_kaldi_binary(path):
            transforms, warps, default_class = kaldiio.read_lvtln(path)
            vtln.lvtln = LinearVtln(
                transforms.shape[1], transforms.shape[0],
                int(default_class))
            vtln.lvtln.transforms = transforms
            vtln.lvtln.warps = warps
        else:
            vtln.lvtln = LinearVtln.load(path)
        return vtln

    def save(self, path):
        """Save the LVTLN transforms to an npz checkpoint"""
        if os.path.isfile(path):
            raise OSError('{}: file already exists'.format(path))
        if not isinstance(self.lvtln, LinearVtln):
            raise TypeError('VTLN not initialized')
        self.lvtln.save(path)

    def save_kaldi(self, path):
        """Save the LVTLN in Kaldi's binary LinearVtln format
        (readable by Kaldi tools and the reference's pykaldi
        loader)."""
        if os.path.isfile(path):
            raise OSError('{}: file already exists'.format(path))
        if not isinstance(self.lvtln, LinearVtln):
            raise TypeError('VTLN not initialized')
        from shennong_tpu import kaldiio
        kaldiio.write_lvtln(
            path, self.lvtln.transforms, self.lvtln.warps,
            self.lvtln.default_class)

    @classmethod
    def load_warps(cls, path):
        """Load precomputed warps from a YAML file"""
        if not os.path.isfile(path):
            raise OSError('{}: file not found'.format(path))
        try:
            with open(path, 'r') as fp:
                return yaml.load(fp, Loader=yaml.FullLoader)
        except yaml.YAMLError as err:  # pragma: nocover
            raise ValueError(
                'Error in VTLN warps file when loading: {}'.format(err))

    def save_warps(self, path):
        """Save the computed warps to a YAML file"""
        if os.path.isfile(path):
            raise OSError('{}: file already exists'.format(path))
        if not isinstance(self.warps, dict):
            raise TypeError('Warps not computed')
        with open(path, 'w') as fp:
            yaml.dump(self.warps, fp)

    def compute_mapping_transform(
            self, feats_untransformed, feats_transformed,
            class_idx, warp, weights=None):
        """Fit one warp class as the least-squares map from unwarped
        to warped features (with per-dimension variance
        normalization)."""
        if not isinstance(self.lvtln, LinearVtln):
            raise TypeError('VTLN not initialized')
        dim = self.lvtln.dim

        def pairs():
            for utt in feats_untransformed:
                if utt not in feats_transformed:
                    raise ValueError(
                        f'No transformed features for key {utt}')
                x = feats_untransformed[utt].data
                y = feats_transformed[utt].data
                if x.shape != y.shape or x.shape[1] != dim:
                    raise ValueError(
                        'Number of rows and/or columns differs: '
                        f'{x.shape[0]} vs {y.shape[0]} rows, '
                        f'{x.shape[1]} vs {y.shape[1]} columns, '
                        f'{dim} dim')
                w = None
                if weights is not None:
                    if utt not in weights:
                        raise ValueError(
                            f'No weights for utterance {utt}')
                    w = weights[utt]
                yield x, y, w

        matrix = compute_mapping_transform(pairs(), dim)
        self.lvtln.set_transform(class_idx, matrix)
        self.lvtln.set_warp(class_idx, warp)

    def _accumulate_group_stats(self, ubm, feats_collection,
                                posteriors, groups,
                                chunk_frames=16384):
        """fMLLR statistics of every speaker group, on device.

        Frames of all utterances are concatenated with a per-frame
        group index and run through
        :func:`shennong_tpu.ops.fmllr.fmllr_stats_groups` in bounded
        chunks (one device program per chunk instead of per-frame host
        loops); chunk statistics are summed in float64 like Kaldi's
        double-precision ``AffineXformStats``.
        """
        import jax.numpy as jnp

        from shennong_tpu.ops.fmllr import fmllr_stats_groups
        from shennong_tpu.ops.framing import bucket_size

        group_names = sorted(groups)
        group_index = {name: i for i, name in enumerate(group_names)}

        feats_list, idx_list, val_list, gid_list = [], [], [], []
        for group in group_names:
            for utt in groups[group]:
                if utt not in posteriors:
                    raise ValueError(f'No posterior for utterance {utt}')
                feats = feats_collection[utt].data
                indices, values = posteriors[utt]
                if indices.shape[0] != feats.shape[0]:
                    raise ValueError(
                        f'Posterior has wrong size {indices.shape[0]}'
                        f' vs {feats.shape[0]}')
                feats_list.append(feats)
                idx_list.append(indices)
                val_list.append(values)
                gid_list.append(
                    np.full(feats.shape[0], group_index[group],
                            dtype=np.int32))

        dim = self.lvtln.dim
        nspeakers = len(group_names)
        out = {
            name: FmllrStats(dim) for name in group_names}
        if not feats_list:
            # every group is empty on this caller (a distributed
            # process whose shard holds no utterances): zero stats,
            # merged with the other processes' by the collective
            return out
        feats_all = np.concatenate(feats_list).astype(np.float32)
        idx_all = np.concatenate(idx_list).astype(np.int32)
        val_all = np.concatenate(val_list).astype(np.float32)
        gid_all = np.concatenate(gid_list)
        # the model is constant across the chunk loop: convert and
        # upload it once
        means_dev = jnp.asarray(ubm.gmm.means, dtype=jnp.float32)
        inv_vars_dev = jnp.asarray(ubm.gmm.inv_vars, dtype=jnp.float32)
        for start in range(0, feats_all.shape[0], chunk_frames):
            stop = min(start + chunk_frames, feats_all.shape[0])
            rows = stop - start
            bucket = bucket_size(rows, minimum=2048)
            feats = np.zeros((bucket, dim), dtype=np.float32)
            feats[:rows] = feats_all[start:stop]
            idx = np.zeros((bucket, idx_all.shape[1]), dtype=np.int32)
            idx[:rows] = idx_all[start:stop]
            val = np.zeros((bucket, val_all.shape[1]), dtype=np.float32)
            val[:rows] = val_all[start:stop]
            gid = np.zeros(bucket, dtype=np.int32)
            gid[:rows] = gid_all[start:stop]

            beta, K, G = fmllr_stats_groups(
                jnp.asarray(feats), jnp.asarray(idx),
                jnp.asarray(val), jnp.asarray(gid),
                means_dev, inv_vars_dev, nspeakers)
            beta = np.asarray(beta, dtype=np.float64)
            K = np.asarray(K, dtype=np.float64)
            G = np.asarray(G, dtype=np.float64)
            for i, name in enumerate(group_names):
                out[name].beta += beta[i]
                out[name].K += K[i]
                out[name].G += G[i]
        return out

    def estimate(self, ubm, feats_collection, posteriors,
                 utt2speak=None):
        """Estimate per-speaker (or per-utterance) LVTLN transforms.

        ``posteriors`` maps utterances to (indices, values) posterior
        arrays from
        :func:`DiagUbmProcessor.gaussian_selection_to_post`. Returns
        (transforms, warps) dicts.
        """
        if not isinstance(self.lvtln, LinearVtln):
            raise TypeError('VTLN not initialized')

        transforms, warps = {}, {}
        tot_impr, tot_count = 0.0, 0.0
        class_counts = np.zeros(self.lvtln.num_classes)

        if utt2speak is not None:
            # every utterance must be mapped — the reference
            # partitions the collection by utt2speak and raises on
            # unmapped items (features_collection.py:215-219);
            # silently dropping them would return wrong warps
            missing = [
                utt for utt in feats_collection if utt not in utt2speak]
            if missing:
                raise ValueError(
                    'following items are not defined in the '
                    'partition index: {}'.format(', '.join(missing)))
            groups = {}
            for utt, spk in utt2speak.items():
                groups.setdefault(spk, []).append(utt)
        else:
            groups = {utt: [utt] for utt in feats_collection}

        group_stats = self._accumulate_group_stats(
            ubm, feats_collection, posteriors, groups)

        for group, utts in sorted(groups.items()):
            stats = group_stats[group]
            class_idx, _, transform, objf_impr, count = (
                self.lvtln.compute_transform(
                    stats, self.norm_type, self.logdet_scale))
            class_counts[class_idx] += 1
            transforms[group] = transform
            warps[group] = self.lvtln.get_warp(class_idx)
            self.log.debug(
                '%s: auxf-impr from LVTLN is %s, over %s frames',
                group, objf_impr / count, count)
            tot_impr += objf_impr
            tot_count += count

        self.log.debug(
            'Distribution of classes is %s, overall LVTLN auxf-impr '
            'per frame is %s over %s frames', class_counts,
            tot_impr / max(tot_count, 1e-10), tot_count)
        return transforms, warps

    def process(self, utterances, ubm=None, group_by='utterance',
                njobs=1):
        """Compute the VTLN warp factor of each utterance (or speaker).

        Trains (or reuses) a UBM-GMM, fits the per-warp base linear
        transforms by re-extracting warped MFCCs for each warp class,
        then alternates transform estimation and model updates for
        ``num_iters`` iterations. Returns a dict of warps keyed by
        utterance or by speaker according to ``group_by``.
        """
        if group_by not in ('utterance', 'speaker'):
            raise ValueError(
                f'group_by must be "utterance" or "speaker", '
                f'it is: {group_by}')
        if group_by == 'speaker' and not self.by_speaker:
            raise ValueError(
                'Asking to group warps by speaker but they are computed '
                'per utterance, please set VtlnProcessor.by_speaker to '
                'True')
        if self.by_speaker and not utterances.has_speakers():
            raise ValueError(
                'Requested speaker based VTLN, but speaker'
                ' information is missing')

        utt2speak = None
        if self.by_speaker:
            utt2speak = {utt.name: utt.speaker for utt in utterances}

        if self.min_warp > self.max_warp:
            raise ValueError(
                f'Min warp > max warp: {self.min_warp} > {self.max_warp}')

        # one device-signal cache spans every corpus sweep of the
        # training flow (UBM front-end, VTLN front-end, warp moments):
        # the audio bytes are identical each pass, so they upload once
        from shennong_tpu.parallel.stream import SignalCache
        signal_cache = getattr(self, '_signal_cache', None)
        if signal_cache is None:
            signal_cache = SignalCache()

        # the UBM-GMM
        if ubm is None:
            ubm = DiagUbmProcessor(**self.ubm)
            ubm.log.setLevel(self.log.getEffectiveLevel())
            ubm._signal_cache = signal_cache
            ubm._retain_frontend = True
            try:
                ubm.process(utterances, njobs=njobs)
            finally:
                ubm.__dict__.pop('_signal_cache', None)
                ubm.__dict__.pop('_retain_frontend', None)
        else:
            if ubm.gmm is None:
                raise ValueError('Given UBM-GMM has not been trained')
            self.ubm = ubm.get_params()

        self.log.info('Initializing base LVTLN transforms')
        dim = ubm.gmm.dim()
        num_classes = int(
            1.5 + (self.max_warp - self.min_warp) / self.warp_step)
        default_class = int(0.5 + (1 - self.min_warp) / self.warp_step)
        self.lvtln = LinearVtln(dim, num_classes, default_class)

        # extraction must run without the sliding CMVN; restore the
        # configuration even when a stage raises so a retried
        # processor keeps the parameters the user set
        cmvn_config = self.features.pop('sliding_window_cmvn', None)
        try:
            return self._process_body(
                utterances, ubm, njobs, group_by, utt2speak,
                cmvn_config, num_classes, signal_cache)
        finally:
            if cmvn_config is not None:
                self.features['sliding_window_cmvn'] = cmvn_config

    def _process_body(self, utterances, ubm, njobs, group_by,
                      utt2speak, cmvn_config, num_classes,
                      signal_cache=None):
        if not self._device_body(
                utterances, ubm, njobs, utt2speak, cmvn_config,
                num_classes, signal_cache):
            self._staged_body(
                utterances, ubm, njobs, utt2speak, cmvn_config,
                num_classes)

        if self.by_speaker:
            self.transforms = {
                utt: self.transforms[spk]
                for utt, spk in utt2speak.items()}
            self.warps = {
                utt: self.warps[spk]
                for utt, spk in utt2speak.items()}

        self.log.info('Done training LVTLN model')
        if group_by == 'utterance':
            return self.warps
        return {
            spk: self.warps[utts[0].name]
            for spk, utts in utterances.by_speaker().items()}

    def _device_body(self, utterances, ubm, njobs, utt2speak,
                     cmvn_config, num_classes, signal_cache=None):
        """Fully device-resident LVTLN training; True when handled.

        Streams the corpus once through the shared GMM-training
        front-end (:func:`shennong_tpu.processor.ubm.stream_frontend`
        — features never reach the host), fits the warp-class base
        transforms from the fused moment pass, computes gaussian
        selection as one device top-k over the flat frame matrix and
        runs every estimation round in the fused
        :func:`shennong_tpu.ops.fmllr.lvtln_rounds` program. Falls
        back (False) for configurations the fused path does not
        cover: shape-changing UBM updates, non-MFCC features,
        hour-scale utterances.
        """
        import copy as _copy

        import jax.numpy as jnp

        from shennong_tpu.ops import gmm as gmm_ops
        from shennong_tpu.ops.fmllr import solve_mapping_from_moments
        from shennong_tpu.processor import ubm as ubm_module

        # always un-pin the UBM's retained front-end pass, even on the
        # early fallbacks below: the flat feature matrix is
        # corpus-sized device memory that must not stay alive through
        # the staged path
        front = ubm.__dict__.pop('_frontend_result', None)

        if ubm.remove_low_count_gaussians:
            return False

        # a caller-populated gaussian selection carries Kaldi
        # --gselect semantics: later selections must REFINE within
        # the stored per-frame subsets. The fused path computes a
        # fresh top-k over all components, so route such UBMs
        # through the staged path (ubm.gaussian_selection refines)
        if ubm.selection:
            return False

        features_config = _copy.deepcopy(self.features)
        if cmvn_config is not None:
            features_config['sliding_window_cmvn'] = cmvn_config
        # the default configuration trains the UBM on exactly the
        # features this front-end would recompute: reuse its retained
        # device-resident pass instead of re-streaming the corpus
        if front is not None and not (
                features_config == ubm.features
                and int(self.subsample) == int(ubm.subsample)):
            front = None
        if front is None:
            front = ubm_module.stream_frontend(
                features_config, ubm.vad, self.subsample, utterances,
                njobs=njobs, signal_cache=signal_cache)
        if front is None:
            return False
        flat, _, w_em, _, layout = front

        class_warps = [
            self.min_warp + c * self.warp_step
            for c in range(num_classes)]

        # per-utterance selection weights for the fused moment pass
        # (the flat rows map back to utterances through the layout)
        w_host = np.asarray(w_em)
        keep = {}
        for names, frames_per_row, offset in layout:
            for row, name in enumerate(names):
                start = offset + row * frames_per_row
                keep[name] = w_host[start:start + frames_per_row]

        moments = pipeline.accumulate_warp_mapping_stats(
            self.features, utterances, class_warps, keep,
            null_logger(), njobs=njobs, signal_cache=signal_cache)
        if moments is None:
            return False
        self.log.info(
            'Computing base transforms for %s warp classes '
            '(fused device pass)', num_classes)
        matrices = solve_mapping_from_moments(moments)
        for c, this_warp in enumerate(class_warps):
            self.lvtln.set_transform(c, matrices[c])
            self.lvtln.set_warp(c, this_warp)

        if utt2speak is not None:
            def group_of(name):
                return utt2speak[name]
        else:
            def group_of(name):
                return name
        group_names = sorted(
            {group_of(n) for names, _, _ in layout for n in names})
        gindex = {g: i for i, g in enumerate(group_names)}
        gid = np.zeros(flat.shape[0], dtype=np.int32)
        for names, frames_per_row, offset in layout:
            for row, name in enumerate(names):
                start = offset + row * frames_per_row
                gid[start:start + frames_per_row] = \
                    gindex[group_of(name)]
        # batch-padding rows keep gid 0: their weight is zero

        self.log.debug('Computing Gaussian selection info')
        if ubm.num_gselect > ubm.gmm.num_gauss():
            ubm.log.warning(
                'You asked for %s Gaussians but GMM only has %s,'
                ' returning this many. Note: this means the'
                ' Gaussian selection is pointless',
                ubm.num_gselect, ubm.gmm.num_gauss())
            ubm.num_gselect = ubm.gmm.num_gauss()
        _, gsel = gmm_ops.gaussian_selection(
            flat, *ubm.gmm.as_jax(), ubm.num_gselect)

        # populate ubm.selection like the staged path does (callers
        # may refine or compute posteriors from it afterwards): the
        # selected-frame rows of each utterance, in time order.
        # Gather just the selected rows on device (a bucketed count
        # keeps the gather at a handful of compiled shapes) — a full
        # [N, k] fetch would move ~6x the bytes through the relay
        from shennong_tpu.ops.framing import bucket_size

        total_rows = flat.shape[0]
        num_sel = int(w_host.sum())
        sel_order = jnp.argsort(
            jnp.arange(total_rows)
            + (1 - (w_em > 0).astype(jnp.int32)) * total_rows)
        padded_sel = min(bucket_size(max(num_sel, 1)), total_rows)
        gsel_sel = np.asarray(
            jnp.take(gsel, sel_order[:padded_sel], axis=0))
        if ubm.selection is None:
            ubm.selection = {}
        cursor = 0
        for names, frames_per_row, offset in layout:
            for row, name in enumerate(names):
                start = offset + row * frames_per_row
                count = int(w_host[start:start + frames_per_row].sum())
                ubm.selection[name] = gsel_sel[cursor:cursor + count]
                cursor += count

        self.log.info(
            'Computing LVTLN transforms (%s iterations)',
            self.num_iters)
        self._rounds_fused_arrays(
            ubm, flat, w_em, jnp.asarray(gid), gsel, group_names)
        return True

    def _staged_body(self, utterances, ubm, njobs, utt2speak,
                     cmvn_config, num_classes):
        raw_mfcc = pipeline.extract_features(
            self.features, utterances, njobs=njobs, log=null_logger())

        # batched VAD decisions
        self.log.debug('... computing VAD decision')
        vad = {
            utt: decision.data.reshape(-1).astype(bool)
            for utt, decision in VadPostProcessor(
                **ubm.vad).process_all(raw_mfcc).items()}

        # normalized features for the model updates (batched)
        if cmvn_config is not None:
            orig_features = SlidingWindowCmvnPostProcessor(
                **cmvn_config).process_all(raw_mfcc)
        else:
            orig_features = raw_mfcc
        orig_features = orig_features.trim(vad)
        orig_features = FeaturesCollection({
            utt: feats.copy(subsample=self.subsample)
            for utt, feats in orig_features.items()})

        # base transforms: solve the unwarped -> warped LS map per
        # class. The fused device path accumulates the per-class
        # normal equations without materializing the 41 warped
        # collections; the per-frame selection weights reproduce
        # trim(vad) followed by [::subsample].
        class_warps = [
            self.min_warp + c * self.warp_step
            for c in range(num_classes)]

        keep = {}
        for utt, mask in vad.items():
            rank = np.cumsum(mask) - 1
            keep[utt] = (
                mask & (rank % self.subsample == 0)).astype(np.float32)

        moments = pipeline.accumulate_warp_mapping_stats(
            self.features, utterances, class_warps, keep,
            null_logger(), njobs=njobs)
        if moments is not None:
            self.log.info(
                'Computing base transforms for %s warp classes '
                '(fused device pass)', num_classes)
            from shennong_tpu.ops.fmllr import solve_mapping_from_moments
            matrices = solve_mapping_from_moments(moments)
            for c, this_warp in enumerate(class_warps):
                self.lvtln.set_transform(c, matrices[c])
                self.lvtln.set_warp(c, this_warp)
        else:
            featsub_unwarped = raw_mfcc.trim(vad)
            featsub_unwarped = FeaturesCollection({
                utt: feats.copy(subsample=self.subsample)
                for utt, feats in featsub_unwarped.items()})
            warped_collections = pipeline.extract_features_warp_classes(
                self.features, utterances, class_warps,
                null_logger(), njobs=njobs)
            for c, this_warp in enumerate(class_warps):
                self.log.info(
                    'Computing base transform (warp=%s) %s/%s',
                    this_warp, c + 1, num_classes)
                featsub_warped = warped_collections[c].trim(vad)
                featsub_warped = FeaturesCollection({
                    utt: feats.copy(subsample=self.subsample)
                    for utt, feats in featsub_warped.items()})
                self.compute_mapping_transform(
                    featsub_unwarped, featsub_warped, c, this_warp)
            del featsub_warped, featsub_unwarped

        del vad

        self.log.debug('Computing Gaussian selection info')
        ubm.gaussian_selection(orig_features)

        self.log.info(
            'Computing LVTLN transforms (%s iterations)', self.num_iters)

        if not ubm.remove_low_count_gaussians:
            # the whole estimation loop runs as one device program
            # (ops.fmllr.lvtln_rounds): features, selection, GMM and
            # transforms stay device-resident across all rounds
            self._train_rounds_fused(ubm, orig_features, utt2speak)
        else:
            # component removal changes model shapes mid-loop: keep
            # the host-orchestrated rounds
            self._train_rounds_host(ubm, orig_features, utt2speak)

    def _train_rounds_fused(self, ubm, orig_features, utt2speak):
        """All ``num_iters`` LVTLN rounds in one device program.

        Equivalent to :meth:`_train_rounds_host` when the UBM keeps
        its component count (``remove_low_count_gaussians=False``, the
        default): posteriors, model updates and per-class objective
        maximization fuse into a ``lax.fori_loop``
        (:func:`shennong_tpu.ops.fmllr.lvtln_rounds`).
        """
        import jax.numpy as jnp

        from shennong_tpu.ops.fmllr import lvtln_rounds
        from shennong_tpu.ops.framing import bucket_size
        from shennong_tpu.processor.ubm import DiagGmm

        if utt2speak is not None:
            groups = {}
            for utt, spk in utt2speak.items():
                groups.setdefault(spk, []).append(utt)
        else:
            groups = {utt: [utt] for utt in orig_features}
        group_names = sorted(groups)
        gindex = {name: i for i, name in enumerate(group_names)}

        feats_list, gid_list, sel_list = [], [], []
        for group in group_names:
            for utt in groups[group]:
                data = orig_features[utt].data
                sel = np.asarray(ubm.selection[utt])
                if sel.shape[0] != data.shape[0]:
                    raise ValueError(
                        f'Input gselect utterance {utt} has wrong size')
                feats_list.append(data)
                gid_list.append(np.full(
                    data.shape[0], gindex[group], dtype=np.int32))
                sel_list.append(sel)

        feats_all = np.concatenate(feats_list).astype(np.float32)
        gid_all = np.concatenate(gid_list)
        sel_all = np.concatenate(sel_list).astype(np.int32)

        nrows = feats_all.shape[0]
        bucket = bucket_size(nrows, minimum=2048)
        dim = self.lvtln.dim
        feats = np.zeros((bucket, dim), dtype=np.float32)
        feats[:nrows] = feats_all
        fweights = np.zeros(bucket, dtype=np.float32)
        fweights[:nrows] = 1.0
        gid = np.zeros(bucket, dtype=np.int32)
        gid[:nrows] = gid_all
        gsel = np.zeros((bucket, sel_all.shape[1]), dtype=np.int32)
        gsel[:nrows] = sel_all

        self._rounds_fused_arrays(
            ubm, jnp.asarray(feats), jnp.asarray(fweights),
            jnp.asarray(gid), jnp.asarray(gsel), group_names)

    def _rounds_fused_arrays(self, ubm, feats, fweights, gid, gsel,
                             group_names):
        """Run the fused LVTLN rounds on prepared flat arrays.

        ``feats``/``fweights``/``gid``/``gsel`` are device (or
        device-puttable) [N, ...] arrays, rows with zero weight inert;
        sets ``self.transforms``/``self.warps`` per group and updates
        the UBM in place, exactly like the host rounds.
        """
        import jax.numpy as jnp

        from shennong_tpu.ops.fmllr import lvtln_rounds
        from shennong_tpu.processor.ubm import DiagGmm

        out = lvtln_rounds(
            jnp.asarray(feats), jnp.asarray(fweights),
            jnp.asarray(gid), jnp.asarray(gsel),
            jnp.asarray(self.lvtln.transforms, dtype=jnp.float32),
            jnp.asarray(self.lvtln.warps, dtype=jnp.float32),
            *ubm.gmm.as_jax(),
            num_groups=len(group_names), num_iters=self.num_iters,
            norm_type=self.norm_type, logdet_scale=self.logdet_scale,
            default_class=self.lvtln.default_class,
            min_gaussian_weight=ubm.min_gaussian_weight)
        (gmm_w, gmm_m, gmm_iv, transforms, warps_arr,
         best, impr, beta) = (np.asarray(o) for o in out)

        ubm.gmm = DiagGmm(
            gmm_w.astype(np.float64), gmm_m.astype(np.float64),
            gmm_iv.astype(np.float64))
        self.transforms = {
            name: transforms[i].astype(np.float64)
            for i, name in enumerate(group_names)}
        # warps come back through the class index, not the float32
        # round trip (0.95 must stay exactly 0.95)
        self.warps = {
            name: float(self.lvtln.warps[best[i]])
            for i, name in enumerate(group_names)}

        class_counts = np.bincount(
            best, minlength=self.lvtln.num_classes)
        self.log.debug(
            'Distribution of classes is %s, overall LVTLN auxf-impr '
            'per frame is %s over %s frames', class_counts,
            impr.sum() / max(beta.sum(), 1e-10), beta.sum())

    def _train_rounds_host(self, ubm, orig_features, utt2speak):
        """Host-orchestrated LVTLN rounds (shape-changing UBM)."""
        posteriors = ubm.gaussian_selection_to_post(orig_features)
        self.transforms, self.warps = self.estimate(
            ubm, orig_features, posteriors, utt2speak)

        for i in range(self.num_iters):
            self.log.debug(
                'Updating model on pass %s/%s', i + 1, self.num_iters)

            # apply the current transforms to the features
            features = FeaturesCollection()
            for utt, feats in orig_features.items():
                key = utt if utt2speak is None else utt2speak[utt]
                linear = self.transforms[key][:, :feats.ndims]
                offset = self.transforms[key][:, feats.ndims]
                data = feats.data @ linear.T + offset
                features[utt] = Features(
                    data, feats.times, feats.properties)

            # update the model on the transformed features
            accs = ubm.accumulate(features)
            ubm.estimate(accs)

            # re-estimate the transforms
            posteriors = ubm.gaussian_selection_to_post(features)
            self.transforms, self.warps = self.estimate(
                ubm, orig_features, posteriors, utt2speak)
