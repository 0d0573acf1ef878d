"""View synchronization tests, modelled on reference tests/test_synchronizer.py."""

import numpy as np

from topsy_tpu.view_synchronizer import ViewSynchronizer


class DummyTarget:
    def __init__(self):
        object.__setattr__(self, "set_count", 0)
        object.__setattr__(self, "rotation_matrix", np.eye(3))
        object.__setattr__(self, "scale", 1.0)
        object.__setattr__(self, "position_offset", np.zeros(3))

    def __setattr__(self, key, value):
        object.__setattr__(self, "set_count", self.set_count + 1)
        object.__setattr__(self, key, value)


def test_sync_fans_out():
    a, b, c = DummyTarget(), DummyTarget(), DummyTarget()
    vs = ViewSynchronizer()
    vs.add_view(a)
    vs.add_view(b)
    vs.add_view(c)

    a.scale = 5.0
    vs.perpetuate_update(a)
    assert b.scale == 5.0
    assert c.scale == 5.0


def test_no_echo():
    a, b = DummyTarget(), DummyTarget()
    vs = ViewSynchronizer()
    vs.add_view(a)
    vs.add_view(b)

    a.scale = 2.0
    vs.perpetuate_update(a)
    count_after_first = b.set_count
    # b "reacts" by broadcasting; must not bounce back to a
    vs.perpetuate_update(b)
    assert a.scale == 2.0
    assert b.set_count == count_after_first


def test_update_completed_clears_pending():
    a, b = DummyTarget(), DummyTarget()
    vs = ViewSynchronizer()
    vs.add_view(a)
    vs.add_view(b)
    a.scale = 3.0
    vs.perpetuate_update(a)
    vs.update_completed(b)
    # after completion, a fresh update from b DOES reach a
    b.scale = 7.0
    vs.perpetuate_update(b)
    assert a.scale == 7.0


def test_dotted_and_item_paths():
    class Inner:
        def __init__(self):
            self.value = 1.0
            self.table = {"k": 2.0}

    class Holder:
        def __init__(self):
            self.inner = Inner()

    a, b = Holder(), Holder()
    vs = ViewSynchronizer(synchronize=["inner.value", "inner.table[k]"])
    vs.add_view(a)
    vs.add_view(b)
    a.inner.value = 42.0
    a.inner.table["k"] = 43.0
    vs.perpetuate_update(a)
    assert b.inner.value == 42.0
    assert b.inner.table["k"] == 43.0


def test_remove_view():
    a, b = DummyTarget(), DummyTarget()
    vs = ViewSynchronizer()
    vs.add_view(a)
    vs.add_view(b)
    vs.remove_view(b)
    a.scale = 9.0
    vs.perpetuate_update(a)
    assert b.scale == 1.0
