"""fvcore.nn stub: the decode oracle never calls FlopCountAnalysis; the
encoder oracle only logs its output, so zeros are fine."""


class FlopCountAnalysis:
    def __init__(self, model, inputs):
        self._model = model

    def unsupported_ops_warnings(self, flag):
        return self

    def uncalled_modules_warnings(self, flag):
        return self

    def total(self):
        # nonzero: pretty_string divides complexity shares by the total
        return 1

    def by_module(self):
        class _Zero(dict):
            def __getitem__(self, k):
                return 0

        return _Zero()


def flop_count_table(flops):
    return "(fvcore stub: flops not counted)"
