import jax


def test_devices_are_8_cpu():
    devs = jax.devices()
    print("DEVICES:", devs)
    assert len(devs) == 8, devs
    assert devs[0].platform == "cpu", devs
