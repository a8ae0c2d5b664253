from .replay import (
    DeviceReplayBuffer,
    HostReplayBuffer,
    ReplayState,
    replay_add_batch,
    replay_init,
    replay_sample,
)
