"""Minimal no-op typeguard shim: decorators pass through, checks accept."""


def typechecked(func=None, **kwargs):
    if func is None:
        return lambda f: f
    return func


def check_type(*args, **kwargs):
    return args[0] if args else None


class TypeCheckError(TypeError):
    pass


class _Config:
    collection_check_strategy = None
    typecheck_fail_callback = None


config = _Config()


class CollectionCheckStrategy:
    ALL_ITEMS = "ALL_ITEMS"
    FIRST_ITEM = "FIRST_ITEM"


class TypeCheckConfiguration:
    def __init__(self, *a, **k):
        pass
