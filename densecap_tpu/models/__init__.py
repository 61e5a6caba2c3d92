from . import densecap, localization, lstm, rpn, vgg16  # noqa: F401
