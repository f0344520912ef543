from . import gather, posenc, resize, rope, window  # noqa: F401
