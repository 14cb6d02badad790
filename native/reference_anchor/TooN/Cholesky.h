#include "TooN/TooN.h"
