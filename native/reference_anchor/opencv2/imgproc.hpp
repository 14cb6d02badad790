#pragma once
#include_next <opencv2/imgproc.hpp>
#include <opencv2/calib3d.hpp>
