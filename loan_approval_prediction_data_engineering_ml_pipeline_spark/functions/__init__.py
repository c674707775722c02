from . import cleaning, text, vectors  # noqa: F401
