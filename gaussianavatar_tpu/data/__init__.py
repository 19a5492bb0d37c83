from gaussianavatar_tpu.data.dataset import (
    MonoDatasetTrain,
    MonoDatasetTest,
    MonoDatasetNovelPose,
    MonoDatasetNovelView,
    BatchLoader,
)
