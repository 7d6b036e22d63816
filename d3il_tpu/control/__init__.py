from d3il_tpu.control import gains, cartesian, joint_pd, gripper  # noqa: F401
