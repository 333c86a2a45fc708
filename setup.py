"""Build the optional C extension (audio_calm_native).

The package works without it (pure-Python fallbacks); when a compiler is
available the extension accelerates host-side WAV decoding and WER edit
distance.
"""

from setuptools import Extension, setup
from setuptools.command.build_ext import build_ext


class OptionalBuildExt(build_ext):
    """Don't fail the install if the toolchain is missing."""

    def run(self):
        try:
            super().run()
        except Exception as e:  # pragma: no cover
            print(f"warning: skipping native extension build: {e}")

    def build_extension(self, ext):
        try:
            super().build_extension(ext)
        except Exception as e:  # pragma: no cover
            print(f"warning: skipping {ext.name}: {e}")


setup(
    ext_modules=[
        Extension(
            "audio_calm_native",
            sources=["native/audio_calm_native.c"],
            extra_compile_args=["-O3"],
        )
    ],
    cmdclass={"build_ext": OptionalBuildExt},
)
