"""Installation script for shennong_tpu"""

from setuptools import setup, find_packages

import shennong_tpu


setup(
    name='shennong-tpu',
    version=shennong_tpu.__version__,
    description='A TPU-native speech features extraction toolbox',
    long_description=open('README.md').read(),
    long_description_content_type='text/markdown',
    license='GPL3',
    python_requires='>=3.10',
    packages=find_packages(exclude=['tests', 'tests.*']),
    install_requires=[
        'jax', 'numpy', 'scipy', 'pyyaml', 'h5py'],
    entry_points={'console_scripts': [
        'speech-features = shennong_tpu.cli:main']},
    package_data={'shennong_tpu': [
        'share/crepe/*.npz', 'native/*.cpp']},
    zip_safe=True,
)
