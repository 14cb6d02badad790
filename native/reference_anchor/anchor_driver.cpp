// Anchor driver: runs the UNMODIFIED reference pipeline (rebvio::Rebvio,
// /root/reference/rebvio) on a dumped synthetic sequence and reports
// throughput + the odometry trajectory.
//
// Input directory layout (written by tools/anchor_data.py):
//   meta.txt       "N M H W"
//   images.bin     N*H*W uint8 (raw intensity frames, distorted)
//   image_ts.bin   N int64 (us)
//   imu_ts.bin     M int64 (us)
//   imu_gyro.bin   M*3 float32 (IMU frame, rad/s)
//   imu_acc.bin    M*3 float32 (IMU frame, m/s^2)
//
// Output: <out> trajectory file, one line per odometry in the reference's
// format "ts ox oy oz px py pz" (rebvio.cpp:279-286), plus a timing summary
// line on stdout:  ANCHOR_RESULT frames=<n> wall_s=<t> fps=<f>
//
// Usage: anchor_driver <data_dir> <out_trajectory> [timeout_s]
#include "rebvio/rebvio.hpp"

#include <atomic>
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <fstream>
#include <iostream>
#include <string>
#include <thread>
#include <vector>

namespace {

template <class T>
std::vector<T> readBin(const std::string& path, size_t count) {
  std::ifstream f(path, std::ios::binary);
  if (!f) {
    std::cerr << "cannot open " << path << "\n";
    std::exit(2);
  }
  std::vector<T> out(count);
  f.read(reinterpret_cast<char*>(out.data()), count * sizeof(T));
  if (!f) {
    std::cerr << "short read " << path << "\n";
    std::exit(2);
  }
  return out;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 3) {
    std::cerr << "usage: anchor_driver <data_dir> <out_trajectory> [timeout_s]\n";
    return 2;
  }
  std::string dir = argv[1];
  std::string out_path = argv[2];
  double timeout_s = (argc > 3) ? std::atof(argv[3]) : 600.0;

  int64_t N, M, H, W;
  {
    std::ifstream meta(dir + "/meta.txt");
    if (!(meta >> N >> M >> H >> W)) {
      std::cerr << "bad meta.txt\n";
      return 2;
    }
  }
  std::vector<uint8_t> images = readBin<uint8_t>(dir + "/images.bin", N * H * W);
  std::vector<int64_t> img_ts = readBin<int64_t>(dir + "/image_ts.bin", N);
  std::vector<int64_t> imu_ts = readBin<int64_t>(dir + "/imu_ts.bin", M);
  std::vector<float> gyro = readBin<float>(dir + "/imu_gyro.bin", M * 3);
  std::vector<float> acc = readBin<float>(dir + "/imu_acc.bin", M * 3);

  rebvio::RebvioConfig config;
  rebvio::Rebvio rebvio(config);

  struct Odo {
    uint64_t ts;
    float o[3];
    float p[3];
  };
  std::vector<Odo> trajectory;
  trajectory.reserve(N);
  std::atomic<int> n_odo(0);
  std::atomic<long> total_keylines(0);
  std::atomic<int> n_maps(0);
  rebvio.registerEdgeImageCallback(
      [&](cv::Mat&, rebvio::EdgeMap::SharedPtr& map) {
        total_keylines.fetch_add(map->size());
        n_maps.fetch_add(1);
      });
  rebvio.registerOdometryCallback([&](rebvio::types::Odometry& odo) {
    Odo o;
    o.ts = odo.ts_us;
    for (int i = 0; i < 3; ++i) {
      o.o[i] = odo.orientation[i];
      o.p[i] = odo.position[i];
    }
    trajectory.push_back(o);
    n_odo.fetch_add(1);
  });

  auto t0 = std::chrono::steady_clock::now();
  // Feed the full stream in timestamp order (IMU before the frame that
  // consumes it, matching the rosbag player ros_rebvio.cpp:108-124 at
  // unlimited speed).  The internal queues are unbounded; the two pipeline
  // threads drain them at their own pace, so wall time to the last odometry
  // measures pipeline throughput.
  size_t j = 0;
  for (int64_t i = 0; i < N; ++i) {
    while (j < static_cast<size_t>(M) && imu_ts[j] <= img_ts[i]) {
      rebvio::types::Imu imu;
      imu.ts = static_cast<uint64_t>(imu_ts[j]);
      imu.gyro = TooN::makeVector(gyro[3 * j], gyro[3 * j + 1], gyro[3 * j + 2]);
      imu.acc = TooN::makeVector(acc[3 * j], acc[3 * j + 1], acc[3 * j + 2]);
      rebvio.imuCallback(std::move(imu));
      ++j;
    }
    rebvio::types::Image img;
    img.ts_us = static_cast<uint64_t>(img_ts[i]);
    img.data = cv::Mat(H, W, CV_8UC1, images.data() + i * H * W).clone();
    rebvio.imageCallback(std::move(img));
  }

  // Wait for the estimator to finish all N-1 frame pairs, with a stall
  // detector (the reference latches run_=false on NaN / low matches).
  int last = -1;
  auto last_progress = std::chrono::steady_clock::now();
  while (n_odo.load() < N - 1) {
    std::this_thread::sleep_for(std::chrono::milliseconds(5));
    int cur = n_odo.load();
    auto now = std::chrono::steady_clock::now();
    if (cur != last) {
      last = cur;
      last_progress = now;
    } else if (std::chrono::duration<double>(now - last_progress).count() >
               5.0) {
      std::cerr << "stalled at " << cur << "/" << (N - 1) << " odometries\n";
      break;
    }
    if (std::chrono::duration<double>(now - t0).count() > timeout_s) {
      std::cerr << "timeout\n";
      break;
    }
  }
  auto t1 = std::chrono::steady_clock::now();
  double wall = std::chrono::duration<double>(t1 - t0).count();
  int frames = n_odo.load();

  {
    std::ofstream out(out_path);
    for (const Odo& o : trajectory) {
      char buf[256];
      std::snprintf(buf, sizeof(buf), "%llu %.6f %.6f %.6f %.6f %.6f %.6f",
                    static_cast<unsigned long long>(o.ts), o.o[0], o.o[1],
                    o.o[2], o.p[0], o.p[1], o.p[2]);
      out << buf << "\n";
    }
  }

  std::printf(
      "ANCHOR_RESULT frames=%d wall_s=%.3f fps=%.2f ms_per_frame=%.2f "
      "mean_keylines=%.0f\n",
      frames, wall, frames / wall, 1000.0 * wall / frames,
      n_maps.load() ? double(total_keylines.load()) / n_maps.load() : 0.0);
  return 0;
}
