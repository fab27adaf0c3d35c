from engine.repair.common import same_shape, strictly_empty


class ObjectComparer:
    @staticmethod
    def is_same_object(a, b) -> bool:
        return same_shape(a, b)

    @staticmethod
    def is_strictly_empty(v) -> bool:
        return strictly_empty(v)
