from ..registry import Registry


def register(reg: Registry) -> None:
    pass
