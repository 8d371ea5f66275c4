"""Package build for evo_tpu.

Builds the native event-parser shared library alongside the Python package
(the library also self-builds lazily at import; this makes `pip install .`
produce a complete artifact).
"""

import subprocess
from pathlib import Path

from setuptools import find_packages, setup
from setuptools.command.build_py import build_py


class BuildWithNative(build_py):
    def run(self):
        src = Path(__file__).parent / "evo_tpu" / "native" / "event_parser.cpp"
        out = src.parent / "libevo_native.so"
        try:
            subprocess.run(
                ["g++", "-O3", "-march=native", "-std=c++17", "-shared",
                 "-fPIC", "-pthread", str(src), "-o", str(out)],
                check=True,
            )
        except (OSError, subprocess.CalledProcessError):
            pass  # ctypes loader falls back to the numpy parser
        super().run()


setup(
    name="evo_tpu",
    version="0.1.0",
    description="TPU-native event-based visual odometry framework",
    packages=find_packages(include=["evo_tpu", "evo_tpu.*"]),
    package_data={"evo_tpu.native": ["*.cpp", "*.so", "CMakeLists.txt"]},
    python_requires=">=3.10",
    install_requires=["jax", "numpy", "Pillow"],
    entry_points={"console_scripts": ["evo-tpu=evo_tpu.run.cli:main"]},
    cmdclass={"build_py": BuildWithNative},
)
