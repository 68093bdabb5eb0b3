"""Mock-DDS tests for the real-robot driver (deploy/real_robot.py).

The reference never tests its real-robot path (deploy_real.py:28-291); here a
fake in-process `unitree_sdk2py` module tree stands in for CycloneDDS so the
safety state machine, the Isaac L-R <-> Unitree R-L motor remap
(deploy/configs/go2.yaml leg_joint2motor_idx), CRC stamping and the wireless-
remote byte parsing are all locked by golden vectors without hardware.
"""
import copy
import struct
import sys
import types

import numpy as np
import pytest

from legged_gym_custom_tpu.deploy.real_robot import (
    RemoteController,
    create_damping_cmd,
    create_zero_cmd,
    init_cmd_go,
)

NUM_MOTORS = 20
REMAP = [3, 4, 5, 0, 1, 2, 9, 10, 11, 6, 7, 8]


# ---------------------------------------------------------------------------
# Fake SDK
# ---------------------------------------------------------------------------


class _MotorCmd:
    __slots__ = ("mode", "q", "qd", "kp", "kd", "tau")

    def __init__(self):
        self.mode = 0
        self.q = self.qd = self.kp = self.kd = self.tau = 0.0


class _LowCmd:
    def __init__(self):
        self.head = [0, 0]
        self.level_flag = 0
        self.gpio = 0
        self.motor_cmd = [_MotorCmd() for _ in range(NUM_MOTORS)]
        self.crc = 0


class _MotorState:
    __slots__ = ("q", "dq")

    def __init__(self, q=0.0, dq=0.0):
        self.q = q
        self.dq = dq


class _IMU:
    def __init__(self):
        self.quaternion = [1.0, 0.0, 0.0, 0.0]
        self.gyroscope = [0.0, 0.0, 0.0]
        self.rpy = [0.0, 0.0, 0.0]


class _LowState:
    def __init__(self):
        self.motor_state = [_MotorState() for _ in range(NUM_MOTORS)]
        self.imu_state = _IMU()
        self.wireless_remote = bytes(40)


class _FakeCRC:
    """Deterministic stand-in checksum: the test recomputes it independently."""

    def Crc(self, cmd):
        acc = 0.0
        for mc in cmd.motor_cmd:
            acc += mc.q * 3.0 + mc.kp + mc.kd
        return int(abs(acc) * 1000) & 0xFFFFFFFF


class _FakeBus:
    """Captures published commands; lets tests inject LowState callbacks."""

    def __init__(self):
        self.published = []
        self.subscriber_cb = None


def _install_fake_sdk(monkeypatch, bus):
    root = types.ModuleType("unitree_sdk2py")

    core = types.ModuleType("unitree_sdk2py.core")
    channel = types.ModuleType("unitree_sdk2py.core.channel")

    def ChannelFactoryInitialize(domain, iface):
        bus.domain, bus.iface = domain, iface

    class ChannelPublisher:
        def __init__(self, topic, dtype):
            self.topic = topic

        def Init(self):
            pass

        def Write(self, cmd):
            bus.published.append(copy.deepcopy(cmd))

    class ChannelSubscriber:
        def __init__(self, topic, dtype):
            self.topic = topic

        def Init(self, cb, depth):
            bus.subscriber_cb = cb

    channel.ChannelFactoryInitialize = ChannelFactoryInitialize
    channel.ChannelPublisher = ChannelPublisher
    channel.ChannelSubscriber = ChannelSubscriber

    idl = types.ModuleType("unitree_sdk2py.idl")
    idl_default = types.ModuleType("unitree_sdk2py.idl.default")
    idl_default.unitree_go_msg_dds__LowCmd_ = _LowCmd
    idl_default.unitree_go_msg_dds__LowState_ = _LowState
    idl_go = types.ModuleType("unitree_sdk2py.idl.unitree_go")
    idl_msg = types.ModuleType("unitree_sdk2py.idl.unitree_go.msg")
    idl_dds = types.ModuleType("unitree_sdk2py.idl.unitree_go.msg.dds_")
    idl_dds.LowCmd_ = _LowCmd
    idl_dds.LowState_ = _LowState

    utils = types.ModuleType("unitree_sdk2py.utils")
    crc_mod = types.ModuleType("unitree_sdk2py.utils.crc")
    crc_mod.CRC = _FakeCRC

    go2 = types.ModuleType("unitree_sdk2py.go2")
    sport = types.ModuleType("unitree_sdk2py.go2.sport")
    sport_client = types.ModuleType("unitree_sdk2py.go2.sport.sport_client")

    class SportClient:
        def SetTimeout(self, t):
            pass

        def Init(self):
            pass

        def StandDown(self):
            bus.stand_down = True

    sport_client.SportClient = SportClient

    comm = types.ModuleType("unitree_sdk2py.comm")
    ms = types.ModuleType("unitree_sdk2py.comm.motion_switcher")
    msc_mod = types.ModuleType(
        "unitree_sdk2py.comm.motion_switcher.motion_switcher_client"
    )

    class MotionSwitcherClient:
        def SetTimeout(self, t):
            pass

        def Init(self):
            pass

        def CheckMode(self):
            return 0, {}  # no active mode -> release loop exits

        def ReleaseMode(self):
            pass

    msc_mod.MotionSwitcherClient = MotionSwitcherClient

    mods = {
        "unitree_sdk2py": root,
        "unitree_sdk2py.core": core,
        "unitree_sdk2py.core.channel": channel,
        "unitree_sdk2py.idl": idl,
        "unitree_sdk2py.idl.default": idl_default,
        "unitree_sdk2py.idl.unitree_go": idl_go,
        "unitree_sdk2py.idl.unitree_go.msg": idl_msg,
        "unitree_sdk2py.idl.unitree_go.msg.dds_": idl_dds,
        "unitree_sdk2py.utils": utils,
        "unitree_sdk2py.utils.crc": crc_mod,
        "unitree_sdk2py.go2": go2,
        "unitree_sdk2py.go2.sport": sport,
        "unitree_sdk2py.go2.sport.sport_client": sport_client,
        "unitree_sdk2py.comm": comm,
        "unitree_sdk2py.comm.motion_switcher": ms,
        "unitree_sdk2py.comm.motion_switcher.motion_switcher_client": msc_mod,
    }
    for name, mod in mods.items():
        monkeypatch.setitem(sys.modules, name, mod)


# ---------------------------------------------------------------------------
# Fixtures
# ---------------------------------------------------------------------------


class _Cfg:
    num_actions = 12
    num_proprio = 52
    buffer_length = 10
    num_scan_obs = 132
    num_obs = 52 * 11
    period = 0.45
    fr_offset = 0.0
    bl_offset = 0.0
    fl_offset = 0.5
    br_offset = 0.5
    pitch_offset = 0.0
    roll_offset = 0.0
    ang_vel_scale = 0.25
    dof_pos_scale = 1.0
    dof_vel_scale = 0.05
    action_scale = 0.25
    clip_obs = 100.0
    clip_actions = 3.14
    cmd_scale = np.array([2.0, 2.0, 0.25], np.float32)
    rc_scale = np.array([0.8, 0.5, 1.0], np.float32)
    default_angles = np.array(
        [0.1, 0.8, -1.5, -0.1, 0.8, -1.5, 0.1, 1.0, -1.5, -0.1, 1.0, -1.5],
        np.float32,
    )
    leg_joint2motor_idx = np.asarray(REMAP, np.int32)
    kps = np.full(12, 40.0, np.float32)
    kds = np.full(12, 1.0, np.float32)
    lowcmd_topic = "rt/lowcmd"
    lowstate_topic = "rt/lowstate"
    simulation_dt = 0.005
    control_decimation = 4


@pytest.fixture
def controller(monkeypatch, tmp_path):
    """RobotController over the fake SDK with a random exported bundle."""
    import jax

    from legged_gym_custom_tpu.deploy.export import export_policy_bundle
    from legged_gym_custom_tpu.models.networks import ActorCriticNetworks

    class P:
        actor_hidden_dims = [64, 32]
        critic_hidden_dims = [64, 32]
        priv_encoder_hidden_dims = [16, 8]
        scan_encoder_hidden_dims = [16, 8]
        estimator_hidden_dims = [16, 8]
        use_history = True
        latent_encoder_output_dim = 20
        scan_encoder_output_dim = 32
        activation = "elu"
        init_noise_std = 1.0

    nets = ActorCriticNetworks(
        P, num_proprio=52, num_privileged_obs=29, num_critic_obs=736,
        num_estimated_obs=3, num_scan_obs=132, num_actions=12,
        history_buffer_length=10,
    )
    params = nets.init_params(jax.random.PRNGKey(3))
    bundle = export_policy_bundle(nets, params, str(tmp_path / "bundle"))

    bus = _FakeBus()
    _install_fake_sdk(monkeypatch, bus)
    from legged_gym_custom_tpu.deploy.real_robot import RobotController

    rc = RobotController(_Cfg(), bundle, net_interface="eth0")
    return rc, bus


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------


def test_remote_controller_parsing():
    """Button bits + stick floats from the wireless byte layout
    (reference remote_controller.py:23-39)."""
    r = RemoteController()
    keys = (1 << RemoteController.KEY["A"]) | (1 << RemoteController.KEY["select"])
    data = bytearray(40)
    data[2:4] = struct.pack("H", keys)
    data[4:8] = struct.pack("f", 0.25)     # lx
    data[8:12] = struct.pack("f", -0.5)    # rx
    data[12:16] = struct.pack("f", 0.75)   # ry
    data[20:24] = struct.pack("f", 1.0)    # ly
    r.set(bytes(data))
    assert r.button[RemoteController.KEY["A"]] == 1
    assert r.button[RemoteController.KEY["select"]] == 1
    assert r.button[RemoteController.KEY["start"]] == 0
    assert (r.lx, r.rx, r.ry, r.ly) == (0.25, -0.5, 0.75, 1.0)


def test_command_helpers():
    """Golden values for damping / zero / init commands
    (reference command_helper.py:10-62)."""
    cmd = _LowCmd()
    init_cmd_go(cmd)
    assert cmd.head == [0xFE, 0xEF] and cmd.level_flag == 0xFF
    assert all(mc.mode == 0x01 for mc in cmd.motor_cmd)
    assert cmd.motor_cmd[0].q == pytest.approx(2.146e9)
    assert cmd.motor_cmd[0].qd == pytest.approx(16000.0)

    create_damping_cmd(cmd)
    assert all(mc.kd == 8.0 and mc.kp == 0.0 and mc.q == 0.0 for mc in cmd.motor_cmd)

    create_zero_cmd(cmd)
    assert all(
        mc.kd == 0.0 and mc.kp == 0.0 and mc.q == 0.0 and mc.tau == 0.0
        for mc in cmd.motor_cmd
    )


def test_run_once_motor_remap_and_crc(controller, monkeypatch):
    """Policy targets land at the remapped Unitree motor indices with yaml
    gains, and every published command is CRC-stamped
    (reference deploy_real.py:193-204)."""
    rc, bus = controller
    target = np.arange(12, dtype=np.float32) * 0.1
    monkeypatch.setattr(type(rc), "step", lambda self, t: target, raising=False)

    # feed a LowState through the DDS callback (motor q in Unitree order)
    ls = _LowState()
    for k, j in enumerate(REMAP):
        ls.motor_state[j].q = float(_Cfg.default_angles[k])
    bus.subscriber_cb(ls)
    assert rc.low_state is ls

    rc.run_once()
    assert len(bus.published) == 1
    cmd = bus.published[0]
    for k, j in enumerate(REMAP):
        assert cmd.motor_cmd[j].q == pytest.approx(target[k])
        assert cmd.motor_cmd[j].kp == pytest.approx(40.0)
        assert cmd.motor_cmd[j].kd == pytest.approx(1.0)
        assert cmd.motor_cmd[j].tau == 0.0
    # unmapped motors (12..19) untouched beyond init
    for j in set(range(NUM_MOTORS)) - set(REMAP):
        assert cmd.motor_cmd[j].q == pytest.approx(2.146e9)
    assert cmd.crc == _FakeCRC().Crc(cmd)


def test_sleep_mode_on_flip_and_select(controller):
    """Upside-down or select button -> damping command, policy bypassed
    (reference deploy_real.py:236-259)."""
    rc, bus = controller

    ls = _LowState()
    ls.imu_state.rpy = [1.8, 0.0, 0.0]  # flipped
    bus.subscriber_cb(ls)
    rc.run_once()
    cmd = bus.published[-1]
    assert all(mc.kd == 8.0 and mc.kp == 0.0 for mc in cmd.motor_cmd)
    assert not rc.sleep_mode  # flip guard alone doesn't latch

    # select button latches sleep mode permanently
    ls2 = _LowState()
    data = bytearray(40)
    data[2:4] = struct.pack("H", 1 << RemoteController.KEY["select"])
    ls2.wireless_remote = bytes(data)
    bus.subscriber_cb(ls2)
    rc.run_once()
    assert rc.sleep_mode
    cmd = bus.published[-1]
    assert all(mc.kd == 8.0 and mc.kp == 0.0 for mc in cmd.motor_cmd)

    # still latched after buttons released
    bus.subscriber_cb(_LowState())
    rc.run_once()
    assert rc.sleep_mode
    assert all(mc.kd == 8.0 for mc in bus.published[-1].motor_cmd)


def test_move_to_default_lerp(controller, monkeypatch):
    """2 s interpolation from measured to default angles
    (reference deploy_real.py:134-164)."""
    rc, bus = controller
    monkeypatch.setattr("time.sleep", lambda s: None)
    ls = _LowState()
    for j in range(NUM_MOTORS):
        ls.motor_state[j].q = 0.0
    bus.subscriber_cb(ls)
    bus.published.clear()
    rc.move_to_default_pos(duration_s=rc.control_dt * 4)  # 4 steps
    assert len(bus.published) == 4
    first, last = bus.published[0], bus.published[-1]
    for k, j in enumerate(REMAP):
        assert first.motor_cmd[j].q == pytest.approx(0.0, abs=1e-6)  # alpha=0
        assert last.motor_cmd[j].q == pytest.approx(
            0.75 * _Cfg.default_angles[k], abs=1e-6
        )
