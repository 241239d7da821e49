"""Build hook: compile the optional C++ SMF parser at install time.

``pip install -e .`` tries to build ``commu_tpu/midi/native/libcommu_smf.so``
with the local C++ compiler (same command as the Makefile).  Failure is
non-fatal: commu_tpu.midi.smf transparently falls back to the pure-Python
parser (smf.py:_load_native), so installation never requires a toolchain.
"""
import shutil
import subprocess
from pathlib import Path

from setuptools import setup
from setuptools.command.build_py import build_py


NATIVE_DIR = Path(__file__).parent / "commu_tpu" / "midi" / "native"


def try_build_native() -> bool:
    cxx = shutil.which("g++") or shutil.which("c++") or shutil.which("clang++")
    if cxx is None:
        return False
    src = NATIVE_DIR / "smf_native.cpp"
    out = NATIVE_DIR / "libcommu_smf.so"
    try:
        subprocess.run(
            [cxx, "-O3", "-std=c++17", "-fPIC", "-Wall", "-shared",
             "-o", str(out), str(src)],
            check=True, capture_output=True, timeout=300)
        return True
    except (subprocess.SubprocessError, OSError):
        return False


class BuildPyWithNative(build_py):
    def run(self):
        if try_build_native():
            print("built commu_tpu/midi/native/libcommu_smf.so")
        else:
            print("C++ toolchain unavailable - using the pure-Python SMF "
                  "parser (no functionality lost)")
        super().run()


setup(cmdclass={"build_py": BuildPyWithNative})
