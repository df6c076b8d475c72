"""Public-API parity sweep against the reference package.

Walks every module of the reference (``/root/reference/shennong`` +
``bin/speech_features.py``) with :mod:`ast` — the reference cannot be
imported here (pykaldi/TF are not installed) — collects its public
classes, methods, properties and module-level functions, and asserts
each one has a counterpart in this package. This turns the component
inventory of SURVEY.md §2.1 into an executable regression: any public
surface the reference grows or this package drops fails the suite.

Skipped when the reference checkout is not present (e.g. on an
installed copy of this package).
"""

import ast
import importlib
import os

import pytest

REFERENCE = '/root/reference'

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, 'shennong')),
    reason='reference checkout not available')

# deliberate divergences, each documented where it is implemented
EXEMPT = {
    # argparse plumbing of the reference's bin/ script
    # (bin/speech_features.py:127-234). The CLI contract is the
    # `speech-features config|extract` command surface plus main();
    # our cli.py keeps that contract (tests/test_cli.py drives every
    # subcommand end to end) with its own internal structure.
    ('shennong_tpu.cli', 'parser_config'),
    ('shennong_tpu.cli', 'parser_extract'),
    ('shennong_tpu.cli', 'command_config'),
    ('shennong_tpu.cli', 'command_extract'),
}


def reference_modules():
    """Yield (reference .py path, our module name) pairs."""
    root = os.path.join(REFERENCE, 'shennong')
    for dirpath, _dirs, files in os.walk(root):
        for name in sorted(files):
            if not name.endswith('.py') or name == '__init__.py':
                continue
            rel = os.path.relpath(os.path.join(dirpath, name), root)[:-3]
            yield (
                os.path.join(dirpath, name),
                'shennong_tpu.' + rel.replace(os.sep, '.'))
    # the CLI lives in bin/speech_features.py upstream, cli.py here
    yield (
        os.path.join(REFERENCE, 'bin', 'speech_features.py'),
        'shennong_tpu.cli')


def public_api(path):
    """(classes {name: set of public members}, set of functions)."""
    tree = ast.parse(open(path).read())
    classes, functions = {}, set()
    for node in tree.body:
        if isinstance(node, ast.ClassDef) and not node.name.startswith('_'):
            classes[node.name] = {
                sub.name for sub in node.body
                if isinstance(sub, (ast.FunctionDef, ast.AsyncFunctionDef))
                and not sub.name.startswith('_')}
        elif (isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef))
              and not node.name.startswith('_')):
            functions.add(node.name)
    return classes, functions


@pytest.mark.parametrize(
    'ref_path,module_name', list(reference_modules()),
    ids=lambda v: v.split('.')[-1] if isinstance(v, str) else None)
def test_module_api_covered(ref_path, module_name):
    ours = importlib.import_module(module_name)
    classes, functions = public_api(ref_path)

    missing = []
    for cls, members in classes.items():
        if (module_name, cls) in EXEMPT:
            continue
        obj = getattr(ours, cls, None)
        if obj is None:
            missing.append(cls)
            continue
        missing.extend(
            f'{cls}.{member}' for member in members
            if (module_name, f'{cls}.{member}') not in EXEMPT
            and not hasattr(obj, member))
    missing.extend(
        fn for fn in functions
        if (module_name, fn) not in EXEMPT and not hasattr(ours, fn))

    assert not missing, (
        f'{module_name} lacks reference public API: {sorted(missing)}')


def test_package_root_exports():
    """The reference re-exports the data model at the package root
    (shennong/__init__.py:30-33); ours must match."""
    import shennong_tpu
    for name in ('Audio', 'Features', 'FeaturesCollection',
                 'Utterance', 'Utterances', 'version', 'url'):
        assert hasattr(shennong_tpu, name), name
