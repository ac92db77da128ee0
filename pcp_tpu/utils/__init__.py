from . import graphics, sh, loss, image, general, manhattan  # noqa: F401
