classdef OGLBeamformer < handle
% calllib wrapper over libogl_beamformer_tpu (same API surface as
% the reference's ogl_beamformer MATLAB bindings).
methods (Static)
	function load(libpath, hdrpath)
		if ~libisloaded('libogl_beamformer_tpu')
			loadlibrary(libpath, hdrpath, 'alias', 'libogl_beamformer_tpu');
		end
	end
	function v = api_version()
		v = calllib('libogl_beamformer_tpu', 'beamformer_get_api_version');
	end
	function ok = beamform_data(sp, data, out)
		ok = calllib('libogl_beamformer_tpu', 'beamformer_beamform_data', ...
			sp, data, uint32(numel(data) * 2), out, int32(-1));
	end
	function s = last_error()
		s = calllib('libogl_beamformer_tpu', 'beamformer_get_last_error_string');
	end
end
end