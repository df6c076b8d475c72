"""The ``speech-features`` command line interface.

Same commands and arguments as the reference CLI
(``bin/speech_features.py:127-281`` in bootphon/shennong).

API-compatible with the reference ``bin/speech_features.py``: a
``config`` subcommand generating commented YAML pipeline
configurations and an ``extract`` subcommand running a pipeline over
an utterances index file.

The extraction pipeline is::

     <input-config>     |--> features --> CMVN --> delta -->|
         and         -->|     (VTLN)                        |--> <output-file>
  <input-utterances>    |---------------> pitch ----------->|

Utterances index lines follow one of the four formats::

  <utterance-id> <audio-file>
  <utterance-id> <audio-file> <speaker-id>
  <utterance-id> <audio-file> <tstart> <tstop>
  <utterance-id> <audio-file> <speaker-id> <tstart> <tstop>

Output formats (guessed from the extension): .pkl .h5f .npz .mat .ark
or a folder of CSV files.
"""

import argparse
import os
import sys

if __package__ in (None, ''):
    # executed as a plain script from a source checkout: the package
    # root is the parent of this file's directory
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), os.pardir))

import shennong_tpu.logger as logger
import shennong_tpu.pipeline as pipeline
import shennong_tpu.utils as utils
from shennong_tpu import url, version_long
from shennong_tpu.serializers import supported_extensions
from shennong_tpu.utterances import Utterances


def _parser_config(subparsers, epilog):
    parser = subparsers.add_parser(
        'config',
        description='Generate a configuration for features extraction, '
        "have a 'speech-features --help' for more details",
        epilog=epilog,
        formatter_class=argparse.RawDescriptionHelpFormatter)

    parser.add_argument(
        '-o', '--output', metavar='config-file', default=None,
        help='The YAML configuration file to write. '
        'If not specified, write to stdout')
    parser.add_argument(
        '--no-comments', action='store_true',
        help='Do not include comments in the output YAML configuration '
        'file. By default all parameters in the YAML are explained in '
        'comments.')

    group = parser.add_argument_group('pipeline arguments')
    group.add_argument(
        'features', type=str, choices=pipeline.valid_features(),
        help='Configure the pipeline to extract those features')
    group.add_argument(
        '--cmvn', action='store_true',
        help='Configure with CMVN normalization')
    group.add_argument(
        '--delta', action='store_true',
        help='Configure with deltas extraction')
    group.add_argument(
        '--pitch', choices=['kaldi', 'crepe'],
        help='Configure with Kaldi or CREPE pitch extraction, '
        'no pitch by default')
    group.add_argument(
        '--vtln', choices=['simple', 'full'],
        help='Configure with VTLN normalization, no VTLN by default. '
        'VTLN is not compatible with spectrogram and bottleneck '
        'features.')


def _command_config(args):
    config = pipeline.get_default_config(
        args.features,
        to_yaml=True, yaml_commented=not args.no_comments,
        with_pitch=args.pitch or False,
        with_cmvn=args.cmvn,
        with_delta=args.delta,
        with_vtln=args.vtln or False)

    output = sys.stdout if not args.output else open(args.output, 'w')
    output.write(config)


def _parser_extract(subparsers, epilog):
    parser = subparsers.add_parser(
        'extract',
        description='Extract features from wav files given a '
        "configuration, have a 'speech-features --help' for more details",
        epilog=epilog,
        formatter_class=argparse.RawDescriptionHelpFormatter)

    parser.add_argument(
        '-j', '--njobs', type=int, default=1, metavar='<int>',
        help='number of parallel jobs to use, default to %(default)s')

    group = parser.add_argument_group('input/output arguments')
    group.add_argument(
        'config', metavar='<input-config>', type=str,
        help='pipeline configuration file in YAML format, as generated '
        "by the 'speech-features config' command")
    group.add_argument(
        'utterances', metavar='<input-utterances>', type=str,
        help='utterances index file defining utterances on which to '
        'compute features')
    group.add_argument(
        'output_file', metavar='<output-file>',
        help='file to save the computed features (must not exist)')

    group = parser.add_argument_group('log messages arguments')
    group = group.add_mutually_exclusive_group()
    group.add_argument(
        '-v', '--verbose', action='count', default=0,
        help="increase the amount of logging on stderr (a single '-v' "
        "adds info messages and '-vv' adds debug messages, use "
        "'--quiet' to disable logging)")
    group.add_argument(
        '-q', '--quiet', action='store_true',
        help='do not display any log message')


def _command_extract(args):
    if args.quiet:
        log = utils.null_logger()
    else:
        level = ('warning', 'info', 'debug')[min(args.verbose, 2)]
        log = logger.get_logger(name='speech-features', level=level)

    output_file = args.output_file
    if os.path.exists(output_file):
        log.error('output file already exist: %s', output_file)
        return
    output_ext = os.path.splitext(output_file)[1]
    if output_ext not in supported_extensions().keys():
        log.error(
            'output file has an unsupported extension "%s", must be in %s',
            output_ext, ", ".join(supported_extensions().keys()))
        return

    for filename in (args.config, args.utterances):
        if not os.path.exists(filename):
            log.error('input file not found: %s', filename)

    utterances = Utterances.load(args.utterances)

    features = pipeline.extract_features(
        args.config, utterances, njobs=args.njobs, log=log)

    log.info('saving the features to %s', output_file)
    features.save(output_file)


def _parser_warmup(subparsers, epilog):
    parser = subparsers.add_parser(
        'warmup',
        description=(
            'Precompile the pipeline device programs for a corpus '
            'geometry (batch rows x signal buckets derived from the '
            'audio headers) into the in-process and persistent '
            'compilation caches. Run it at deploy time — or call '
            'shennong_tpu.pipeline.warmup() at server startup — so '
            'the first real extraction runs at warm speed instead of '
            'paying seconds-to-minutes of per-shape compiles.'),
        epilog=epilog,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    parser.add_argument(
        '-j', '--njobs', type=int, default=1, metavar='<int>',
        help='number of parallel jobs to use, default to %(default)s')
    parser.add_argument(
        'config', metavar='<input-config>', type=str,
        help='pipeline configuration file in YAML format, as generated '
        "by the 'speech-features config' command")
    parser.add_argument(
        'utterances', metavar='<input-utterances>', type=str,
        help='utterances index whose corpus geometry to precompile')


def _command_warmup(args):
    log = logger.get_logger(name='speech-features', level='info')
    for filename in (args.config, args.utterances):
        if not os.path.exists(filename):
            log.error('input file not found: %s', filename)
            return
    out = pipeline.warmup(
        args.config, Utterances.load(args.utterances),
        njobs=args.njobs, log=log)
    print(f'warmed {out["programs"]} pipeline geometries '
          f'in {out["seconds"]}s')


def _parser_convert_crepe(subparsers, epilog):
    parser = subparsers.add_parser(
        'convert-crepe',
        description=(
            'Convert a published keras CREPE checkpoint (model-tiny.h5 '
            '... model-full.h5, from github.com/marl/crepe) into the '
            'npz parameter file the JAX forward pass loads. The '
            'converted file is written next to the input or into '
            '--output; install it into shennong_tpu/share/crepe/ to '
            'make the capacity available to CrepePitchProcessor.'),
        epilog=epilog,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    parser.add_argument(
        'checkpoint', help='path to a keras CREPE .h5 checkpoint')
    parser.add_argument(
        '-o', '--output', default=None,
        help='output .npz path (default: alongside the checkpoint, '
        'or directly into the package share directory with --install)')
    parser.add_argument(
        '--install', action='store_true',
        help='write into shennong_tpu/share/crepe/ so the capacity '
        'is immediately usable')


def _command_convert_crepe(args):
    import numpy as np
    from shennong_tpu.models import crepe

    params = crepe.convert_keras_h5(args.checkpoint)
    capacity = crepe.capacity_of(params)

    if args.output:
        output = args.output
    elif args.install:
        output = os.path.join(
            os.path.abspath(crepe.SHARE_DIR), f'model-{capacity}.npz')
    else:
        output = os.path.join(
            os.path.dirname(os.path.abspath(args.checkpoint)),
            f'model-{capacity}.npz')

    np.savez(output, **params)
    print(f'converted {args.checkpoint} (capacity {capacity}) '
          f'-> {output}')


@utils.CatchExceptions
def main():
    """Entry point of the ``speech-features`` program"""
    # first-run compiles dominate cold extractions; persist them
    utils.enable_compilation_cache()
    epilog = (
        f'speech-features is part of the shennong-tpu library\n'
        f'see full documentation at {url()}')

    parser = argparse.ArgumentParser(
        description=__doc__,
        epilog=epilog,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    parser.add_argument(
        '-V', '--version', action='version', version=version_long(),
        help='display version and copyright information and exit')

    subparsers = parser.add_subparsers(
        title='speech-features commands',
        description="use 'speech-features <command> --help' for details",
        help="the 'config' command generates configuration templates, "
        "the 'extract' command extracts features given a configuration",
        dest='command')

    _parser_config(subparsers, epilog)
    _parser_extract(subparsers, epilog)
    _parser_warmup(subparsers, epilog)
    _parser_convert_crepe(subparsers, epilog)

    args = parser.parse_args()
    if args.command == 'config':
        _command_config(args)
    elif args.command == 'extract':
        _command_extract(args)
    elif args.command == 'warmup':
        _command_warmup(args)
    elif args.command == 'convert-crepe':
        _command_convert_crepe(args)


if __name__ == '__main__':
    main()
